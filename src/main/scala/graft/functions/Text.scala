package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text primitives shared by the dedup / text-analysis operators.
  *
  * Hashing design: every deterministic hash in the library is derived from
  * `md5` — identical bytes-in/hex-out in Spark and in the DuckDB oracle —
  * so correctness of hash-based operators (minhash, simhash, fingerprints,
  * LSH bands) is verifiable by exact hash-match against SQL, with no
  * engine-private hash function anywhere. All of it composes from codegen'd
  * built-ins and higher-order array functions; no UDFs in the hot path.
  */
object Text {

  /** Lowercase, strip non-alphanumerics to spaces, collapse whitespace. */
  def normalize(c: Column): Column =
    trim(regexp_replace(lower(c), "[^a-z0-9]+", " "))

  /** Whitespace tokens of the normalized text (array<string>, no empties).
    * Codegen loop (VecExprs.AsciiTokens) — bit-identical to
    * `filter(split(normalize(c), " "), len > 0)` (ExprLawsSpec pins the
    * equivalence) without the two regex passes and the interpreted HOF
    * filter; this is the innermost scan of every text operator.
    */
  def tokens(c: Column): Column = VecExprs.asciiTokens(c)

  /** Word n-gram shingles: array of space-joined n-token windows.
    * Texts shorter than n tokens yield a single shingle of the whole text,
    * so no document silently disappears from dedup candidate generation.
    */
  def wordShingles(c: Column, n: Int): Column = {
    val toks = tokens(c)
    val full = array_join(toks, " ")
    val nShingles = size(toks) - (n - 1)
    when(nShingles <= 0, array(full)).otherwise(
      transform(sequence(lit(0), nShingles - 1),
        i => array_join(slice(toks, i + 1, lit(n)), " ")))
  }

  /** Distinct shingle set (order-free). */
  def shingleSet(c: Column, n: Int): Column = array_distinct(wordShingles(c, n))

  /** MinHash signature as an array of K md5-hex minima:
    * sig_k = min over shingles of md5(shingle || '#' || k).
    * Lexicographic min over fixed-width lowercase hex == numeric min, and is
    * identical in the oracle. Permutation-independent and monotone under
    * shingle-set containment by construction.
    */
  def minhashSignature(shingles: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)),
      seed => array_min(transform(shingles,
        s => md5(concat(s, lit("#"), seed.cast(StringType))))))

  /** LSH band keys: the signature split into bands of `rowsPerBand`, each band
    * hashed to one md5 key. Near-dup pairs collide on >=1 band key.
    */
  def lshBands(sig: Column, rowsPerBand: Int, nBands: Int): Column =
    transform(sequence(lit(0), lit(nBands - 1)),
      b => md5(concat(b.cast(StringType), lit(":"),
        array_join(slice(sig, b * rowsPerBand + 1, lit(rowsPerBand)), "|"))))

  /** 32-bit SimHash from md5 digit parities: bit i of the fingerprint is the
    * sign of sum over tokens of (parity of hex digit i of md5(token)) mapped
    * to +/-1. Returns a LongType (0..2^32-1). Deterministic and exactly
    * reproducible in SQL; the scale path is the blocked hamming join in
    * graft.operators.Dedup.
    */
  def simhash32(c: Column): Column =
    // single-pass loop-codegen expression (VecExprs.Simhash32) — the
    // composed built-in form re-evaluated tokenize+md5 once PER BIT
    // (higher-order functions are CodegenFallback). coalesce preserves the
    // composed form's null collapse: null text -> fingerprint 0.
    coalesce(graft.functions.VecExprs.simhash32(c), lit(0L))

  /** 64-bit SimHash — the scale fingerprint: bits 0..31 are simhash32's
    * md5(token) digit parities, bits 32..63 the same over md5(token || "@").
    * Wider fingerprints let the blocked hamming join use 16-bit pigeonhole
    * blocks (bucket occupancy corpus/65536 instead of corpus/256 — the
    * difference between linear and quadratic block buckets at 100 TB).
    */
  def simhash64(c: Column): Column =
    coalesce(graft.functions.VecExprs.simhash64(c), lit(0L))

  /** Document fingerprint: md5 of the normalized text — exact-dup key. */
  def contentFingerprint(c: Column): Column = md5(normalize(c))

  /** Winnowing-style robust fingerprint: minimum md5 over word 5-gram
    * shingles (stable under local edits near document ends).
    */
  def minShingleFingerprint(c: Column, n: Int = 5): Column =
    array_min(transform(shingleSet(c, n), s => md5(s)))
}
