"""End-to-end training-corpus preparation demo on the operator registry.

The flow a 100 TB data pipeline runs nightly, at fixture scale: quality
gate -> exact + near dedup -> contamination check -> chunking -> split ->
mixture weights; then the vector side: ANN index + recall evaluation.
Every stage is a registered, oracle-checked operator — this script only
composes them.

Run:  PYTHONPATH=. python examples/corpus_prep_demo.py [sf_dir]
"""

from __future__ import annotations

import sys

from datapipelines_python_spark import get_registry, get_spark


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="corpus_prep_demo")
    r = get_registry()

    def run(name: str, show: int = 5) -> None:
        df = r[name].fn(spark, sf)
        print(f"\n=== {name} ({df.count()} rows) ===")
        df.show(show, truncate=80)

    # 1. Quality + hygiene over the raw corpus
    run("llm_quality_gopher")
    run("llm_pii_detect", show=3)
    run("llm_contamination_check")

    # 2. Dedup: exact fingerprints, then near-dup clusters
    run("llm_dedup_exact")
    run("llm_dedup_minhash_lsh")

    # 3. Shaping: chunk for retrieval, split + mixture for training
    run("llm_chunk_documents", show=3)
    run("llm_train_val_split")
    run("llm_dataset_mixture")

    # 4. The whole batch pipeline as ONE Catalyst plan
    run("llm_corpus_pipeline")

    # 5. Vector side: index + evaluate
    run("llm_ann_ivf")
    run("llm_ann_recall")

    spark.stop()


if __name__ == "__main__":
    main()
