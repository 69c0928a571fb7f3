#!/usr/bin/env python3
"""PySpark binding proof for the graft SQL function registry.

The entire expression library is SQL-registered (graft.GraftExtensions)
precisely so non-Scala bindings can call it. This script runs a REAL
pyspark session with the compiled graft classes on the driver classpath
and the extensions conf set, recomputes the registry outputs THROUGH SQL,
and asserts they equal the Scala facade's dump (graft.tools.RegistryDump)
row for row — plus a composed curation-style SQL fragment whose result is
cross-checked against the facade columns.

Usage:
  sbt "runMain graft.tools.RegistryDump /root/testdata/sf0.001 /tmp/registry_dump"
  python3 tools/pyspark_registry_check.py /root/testdata/sf0.001 /tmp/registry_dump

(or just run tools/pyspark_registry_check.sh, which does both)
"""
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    dump = sys.argv[2] if len(sys.argv) > 2 else "/tmp/registry_dump"
    # the PACKAGED jar, not the classes dir: this is the artifact a real
    # Python deployment ships (tools/pyspark_registry_check.sh builds it)
    import glob
    jars = sorted(glob.glob(os.path.join(REPO, "target", "scala-2.13", "*.jar")),
                  key=os.path.getmtime, reverse=True)
    assert jars, "package first: no jar under target/scala-2.13"
    jar = jars[0]

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("graft-pyspark-registry-check")
        # the two supported wirings from README "SQL function registry":
        # cluster-wide extensions conf + the compiled classes on the driver
        .config("spark.driver.extraClassPath", jar)
        .config("spark.sql.extensions", "graft.GraftExtensions")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    spark.read.parquet(os.path.join(sf_dir, "documents.parquet")) \
        .createOrReplaceTempView("documents")

    # 1. the registry functions, called from SQL in a PYTHON process
    sql_out = spark.sql(
        """SELECT doc_id,
               graft_simhash64(text)                                 AS fp,
               graft_minhash_sig(graft_token_shingles(text, 3), 16)  AS sig,
               graft_ngram_rep_stats(text, 2)                        AS reps,
               graft_ngram_tf(text, 16)                              AS tf
        FROM documents"""
    )
    expected = spark.read.parquet(os.path.join(dump, "registry"))
    n = expected.count()
    assert n > 0, "empty facade dump"
    only_sql = sql_out.exceptAll(expected).count()
    only_fac = expected.exceptAll(sql_out).count()
    assert only_sql == 0 and only_fac == 0, (
        f"SQL-from-python != Scala facade: {only_sql} rows only in SQL, "
        f"{only_fac} only in facade dump"
    )
    print(f"OK registry functions: {n} rows identical to the Scala facade")

    # 2. a composed curation-style fragment ENTIRELY in SQL (repetition
    #    gate + simhash parity slice), cross-checked against the same
    #    predicate evaluated over the facade-dumped columns
    frag = spark.sql(
        """SELECT count(*) AS n FROM documents
        WHERE graft_ngram_rep_stats(text, 2).top
                <= 0.2 * graft_ngram_rep_stats(text, 2).total
          AND pmod(graft_simhash64(text), 2) = 0"""
    ).head()["n"]
    expected.createOrReplaceTempView("facade")
    frag_fac = spark.sql(
        """SELECT count(*) AS n FROM facade
        WHERE reps.top <= 0.2 * reps.total AND pmod(fp, 2) = 0"""
    ).head()["n"]
    assert frag == frag_fac and frag > 0, f"fragment mismatch: {frag} vs {frag_fac}"
    print(f"OK curation fragment: {frag} docs pass in both paths")

    # 3. a REAL pipeline from Python: the curation sweep operator itself,
    #    driven through the py4j gateway on the packaged jar (static
    #    forwarders on the Scala object), compared row-for-row with the
    #    Scala-driven reference dump — proof a Python deployment can run
    #    the full operator surface, not just the SQL expression registry
    from pyspark.sql import DataFrame as PyDF

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    corpus = docs.filter("doc_id % 17 != 0")
    bench = docs.filter("doc_id % 17 = 0")
    # py4j resolves exact JVM arity — Scala default args don't exist on
    # the wire, so EVERY parameter is passed (decontaminateN=4,
    # scoreCol=""). The r13 scoreCol addition silently broke the old
    # 5-arg call; the graft.api.Standing facade (part 4) exists precisely
    # so the python surface doesn't chase Scala signature growth.
    out_jdf = spark._jvm.graft.operators.Curation.sweep(
        corpus._jdf, bench._jdf, "text", "doc_id", 4, "")
    swept = PyDF(out_jdf, spark).select(
        "doc_id", "quality_ok", "repetition_ok", "exact_unique",
        "contaminated", "kept")
    ref = spark.read.parquet(os.path.join(dump, "curation"))
    n_sweep = swept.count()
    assert n_sweep == ref.count() > 0, "curation verdict row counts differ"
    diff = swept.exceptAll(ref).count() + ref.exceptAll(swept).count()
    assert diff == 0, f"python-driven sweep != scala-driven sweep: {diff} rows"
    kept = swept.filter("kept").count()
    assert 0 < kept < n_sweep, f"degenerate sweep: kept={kept}/{n_sweep}"
    print(f"OK real pipeline via py4j: Curation.sweep over {n_sweep} docs, "
          f"kept {kept}, identical to the Scala-driven run")

    # 4. the standing-index LIFECYCLE from Python (VERDICT r14 task 5):
    #    ensure (build) -> probe -> re-ensure (reuse) -> keyed re-ensure,
    #    all through the plain-typed facade graft.api.Standing — the
    #    Scala-only signatures (by-name path, Option, default args) are
    #    unreachable from py4j, so the facade IS the python surface. The
    #    probe result must match the Scala-driven reference dump row for
    #    row (same corpus, same scorer, independently built index).
    import tempfile

    S = spark._jvm.graft.api.Standing
    jss = spark._jsparkSession
    idx_dir = tempfile.mkdtemp(prefix="graft_py_bm25")
    built = S.ensureText(corpus._jdf, "text", "doc_id",
                         "graft_py_bm25", idx_dir, 8)
    assert built is True, "first ensure must BUILD"
    reused = S.ensureText(corpus._jdf, "text", "doc_id",
                          "graft_py_bm25", idx_dir, 8)
    assert reused is False, "second ensure must REUSE (listing key)"
    queries = bench.orderBy("doc_id").limit(5).selectExpr(
        "doc_id AS q_id", "text AS q_text")
    hits = PyDF(S.probeText(jss, "graft_py_bm25", queries._jdf,
                            "q_text", "q_id", 10), spark)
    ref_hits = spark.read.parquet(os.path.join(dump, "standing"))
    n_hits = hits.count()
    assert n_hits == ref_hits.count() > 0, "standing probe row counts differ"
    hdiff = hits.exceptAll(ref_hits).count() + ref_hits.exceptAll(hits).count()
    assert hdiff == 0, f"python-driven probe != scala-driven probe: {hdiff}"
    # the ingest-loop path: staleness via a precomputed key — one
    # property read, no corpus scan, no listing
    key = S.storedKey(jss, "graft_py_bm25_postings")
    assert key, "ensure must have stamped a manifest key"
    assert S.ensureTextKeyed(corpus._jdf, "text", "doc_id",
                             "graft_py_bm25", idx_dir, 8, key) is False
    print(f"OK standing lifecycle via py4j: build/reuse/keyed-reuse + "
          f"probe over {n_hits} hits identical to the Scala-driven run")

    spark.stop()
    print("PYSPARK REGISTRY CHECK PASSED")


if __name__ == "__main__":
    main()
