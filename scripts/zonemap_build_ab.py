"""A/B the zonemap fixture cold rebuild (the bench `zonemap_build` probe)
at sf0.1: times N cold rebuilds of the 1.5k-small-file sorted publish and
prints per-run wall + min. Run before/after the small-file range-split
write-path change to attribute the delta.

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
       python scripts/zonemap_build_ab.py [n_runs]
"""

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from s3parq_spark.session import get_spark  # noqa: E402
from s3parq_spark.workload_ext2 import _zonemap_fixture  # noqa: E402


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ["SPARK_GRAFT_SF_DIR"]
    spark = get_spark()
    # warm: one build outside the timed region (JIT/classloading)
    path = _zonemap_fixture(spark, sf_dir)
    times = []
    for i in range(n):
        shutil.rmtree(path, ignore_errors=True)
        spark.sparkContext.setJobDescription(f"zonemap_build ab run {i}")
        t0 = time.time()
        _zonemap_fixture(spark, sf_dir)
        times.append(time.time() - t0)
        print(f"run {i}: {times[-1]:.3f} s", flush=True)
    print(f"min of {n}: {min(times):.3f} s")
    n_files = sum(
        1
        for root, _, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet")
    )
    print(f"files: {n_files}")
    spark.stop()


if __name__ == "__main__":
    main()
