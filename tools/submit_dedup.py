"""The spark-submit ship path for the near-duplicate pipeline.

north_rule: "the job ships via spark-submit --py-files". Usage:

    spark-submit \\
      --master <cluster-master> \\
      --py-files "$(python -c 'from acxspark.session import package_zip; print(package_zip())')" \\
      tools/submit_dedup.py \\
      --input  s3://bucket/webpages/            # parquet: url, [html,] text, ... \\
      --output s3://bucket/dedup_run_01/ \\
      [--use-extract] [--redact] [--text-col text] \\
      [--catalog s3://bucket/dedup_run_01/_catalog]   # resume snapshots

Writes three parquet datasets under --output:
  clusters/   (url, cluster_id)        — every doc labeled
  survivors/  input columns            — first-wins canonicals (redacted if --redact)
  edges/      (id_a, id_b, tier)       — the evidence graph
plus lineage counters as JSON (docs scanned, pairs emitted, clusters).

Locally testable end-to-end with the same file:
    spark-submit --master 'local[4]' --py-files <zip> tools/submit_dedup.py \\
        --input BENCH/corpus_40000 --output /tmp/dedup_out
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser(description="acxspark near-dup pipeline job")
    ap.add_argument("--input", required=True, help="input parquet (webpages table)")
    ap.add_argument("--output", required=True, help="output directory")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--use-extract", action="store_true",
                    help="run the html→text extraction stage first")
    ap.add_argument("--redact", action="store_true",
                    help="scrub PII from survivor text (post-clustering)")
    ap.add_argument("--catalog", default=None,
                    help="snapshot dir: CC rounds commit here and resume after a kill")
    ap.add_argument("--shuffle-partitions", type=int, default=None,
                    help="override spark.sql.shuffle.partitions (else submit conf/AQE)")
    ap.add_argument("--shingle-max-doc-freq", type=float, default=None,
                    help="drop shingles in more than this FRACTION of docs before "
                         "signatures (boilerplate/idf cut; off by default)")
    ap.add_argument("--df-sample-mod", type=int, default=1,
                    help="estimate gram doc-frequency on the deterministic "
                         "1/MOD content-keyed sample (1 = exact count)")
    ap.add_argument("--span-dedup-k", type=int, default=None,
                    help="post-clustering ExactSubstr pass: strip token spans "
                         ">= K shared between survivors (Lee et al. 2021; "
                         "50 is the paper's floor; off by default)")
    args = ap.parse_args()

    from acxspark.catalog import ParquetSnapshotCatalog
    from acxspark.config import DedupConfig
    from acxspark.plans.pipeline import run_pipeline
    from acxspark.session import get_spark

    spark = get_spark("acx-dedup", cluster=True,
                      shuffle_partitions=args.shuffle_partitions)
    web = spark.read.parquet(args.input)
    cat = ParquetSnapshotCatalog(args.catalog) if args.catalog else None

    res = run_pipeline(
        web,
        cfg=DedupConfig(
            shingle_max_doc_freq=args.shingle_max_doc_freq,
            df_sample_mod=args.df_sample_mod,
        ),
        lineage_path=f"{args.output}/lineage.json",
        catalog=cat,
        use_extract=args.use_extract,
        redact=args.redact,
        span_dedup_k=args.span_dedup_k,
        text_col=args.text_col,
    )
    res.clusters.write.mode("overwrite").parquet(f"{args.output}/clusters")
    res.survivors.write.mode("overwrite").parquet(f"{args.output}/survivors")
    res.edges.write.mode("overwrite").parquet(f"{args.output}/edges")
    res.lineage.flush()
    res.release()
    print(f"dedup complete: {args.output}/{{clusters,survivors,edges}}")


if __name__ == "__main__":
    main()
