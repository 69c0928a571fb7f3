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
    classes = os.path.join(REPO, "target", "scala-2.13", "classes")
    assert os.path.isdir(classes), f"compile first: {classes} missing"

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("graft-pyspark-registry-check")
        # the two supported wirings from README "SQL function registry":
        # cluster-wide extensions conf + the compiled classes on the driver
        .config("spark.driver.extraClassPath", classes)
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
    expected = spark.read.parquet(dump)
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

    spark.stop()
    print("PYSPARK REGISTRY CHECK PASSED")


if __name__ == "__main__":
    main()
