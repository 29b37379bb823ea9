"""One knob for the 100 TB guards: run the near-dup operators under the
``corpus`` scale profile (profiles.py) and show the drop metrics.

At test scale the caps never fire and results are bit-identical to the
unguarded defaults; at corpus scale the same call is the difference
between a bounded bucket join and a quadratic blow-up on one hot bucket.

Run:  python examples/scale_profile_dedup.py [sf_dir]
(defaults to /root/testdata/sf0.01)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scrapontologies_spark import profiles
from scrapontologies_spark.operators import dedup
from scrapontologies_spark.session import build_session


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = build_session(app_name="example-scale-profile")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    print(f"profile: {profiles.CORPUS}")

    # the SAME call a 100 TB job makes — every guard set by the profile
    metrics: dict = {}
    pairs = dedup.lsh_candidate_pairs(
        dedup.minhash_signatures(dedup.shingles(docs), num_hashes=8),
        scale="corpus",
        bucket_metrics=metrics,
    )
    print(f"candidate pairs: {pairs.count()}")
    print(f"hot buckets dropped: {metrics['hot_buckets']} "
          f"(carrying {metrics['hot_bucket_rows']} rows)")

    near = dedup.ngram_jaccard_pairs(docs, threshold=0.5, scale="corpus")
    print(f"near-duplicate pairs (jaccard >= 0.5): {near.count()}")
    spark.stop()


if __name__ == "__main__":
    main()
