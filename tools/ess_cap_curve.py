"""ESS_MAX_OCC cost/recall curve for exact_substring_matches at sf1
(VERDICT r7 item 2): for each cap, cold wall time of the full query,
in-cap matched-position pair rows (the volume the island window must
shuffle — the measured sf1 cost driver), and maximal runs reported.

The cap is the production knob on boilerplate-adversarial corpora
(sf1's generator draws from a fixed 31-word vocabulary, so EVERY gram
is frequent and pair volume grows ~quadratically in per-gram
occurrences); this table is the committed evidence of what turning it
buys. Run: python tools/ess_cap_curve.py [sf_dir]
Prints a markdown table (paste into SCALING_MEASURED.md).
"""

from __future__ import annotations

import os
import sys
import time

# repo root = parent of tools/ — works from any checkout location
sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F  # noqa: E402

from data_warehouse_co_healthy_spark.session import get_spark  # noqa: E402
from data_warehouse_co_healthy_spark.llm.dedup import (  # noqa: E402
    ESS_K,
    ESS_MAX_OCC,
    _exact_substring_matches,
    spread,
)
from data_warehouse_co_healthy_spark.catalog import load_table  # noqa: E402

CAPS = [ESS_MAX_OCC // 4, ESS_MAX_OCC // 2, ESS_MAX_OCC]


def pair_rows(spark, sf_dir: str, cap: int) -> int:
    """In-cap matched-position pairs = sum over surviving grams of
    C(occ, 2)-ish cross-doc volume; counted exactly from the capped
    gram stream without building the pair frame."""
    d = spread(load_table(spark, sf_dir, "documents"))
    t = d.select("doc_id", F.lower("text").alias("t")).filter(
        F.length("t") >= ESS_K
    )
    grams = t.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(1, length(t) - {ESS_K - 1}), "
                f"i -> xxhash64(substr(t, i, {ESS_K})))"
            )
        ).alias("fp"),
    )
    per_fp = grams.groupBy("fp").agg(
        F.count("*").alias("oc"),
    ).filter(F.col("oc") <= cap)
    # doc_a < doc_b pair rows per gram = (oc² - Σ_doc occ_doc²) / 2;
    # approximate cheaply with the exact same-doc correction:
    per_doc = grams.groupBy("fp", "doc_id").agg(
        F.count("*").alias("od")
    )
    tot = (
        per_doc.join(per_fp.select("fp", "oc"), "fp")
        .groupBy("fp", "oc")
        .agg(F.sum(F.col("od") * F.col("od")).alias("sq"))
        .select(
            ((F.col("oc") * F.col("oc") - F.col("sq")) / 2).alias("p")
        )
        .agg(F.sum("p"))
        .first()[0]
    )
    return int(tot or 0)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/testdata_sf1"
    spark = get_spark("ess-cap-curve")
    spark.sparkContext.setLogLevel("ERROR")
    # warmup (JVM/codegen) on the smallest available fixture: the
    # sf0.001 sibling of the target dir, else the standard fixture
    # path. When neither exists the warmup is SKIPPED (warming on the
    # full target could cost more than the measurement) — noted on
    # stdout because the first timed row then absorbs JVM startup.
    warmup_dir = os.path.join(
        os.path.dirname(sf_dir.rstrip("/")), "sf0.001"
    )
    if not os.path.isdir(warmup_dir):
        warmup_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warmup_dir):
        _exact_substring_matches(spark, warmup_dir, 200).count()
    else:
        print("warmup fixture not found: first row includes JVM "
              "startup cost")

    print(f"ESS cap curve at {sf_dir} (cold per run, best of 2)\n")
    print("| cap | wall sec | in-cap pair rows | maximal runs |")
    print("|---|---|---|---|")
    for cap in CAPS:
        best, runs = float("inf"), 0
        for _ in range(2):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            runs = _exact_substring_matches(spark, sf_dir, cap).count()
            best = min(best, time.perf_counter() - t0)
        pr = pair_rows(spark, sf_dir, cap)
        print(f"| {cap} | {best:.1f} | {pr:,} | {runs:,} |")
    spark.stop()


if __name__ == "__main__":
    main()
