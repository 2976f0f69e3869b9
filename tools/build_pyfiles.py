"""Build dist/etl_rs_spark.zip for `spark-submit --py-files`.

The north rule's launch mode is

    spark-submit --py-files dist/etl_rs_spark.zip jobs/replay.py ...

In-process sessions ship the package automatically
(etl_rs_spark.session.ship_package); this tool emits the same archive
as a file artifact for cluster submission. The zip contains ONLY the
package (no tests/bench), rooted so `import etl_rs_spark` works on
executors.
"""

from __future__ import annotations

import os
import shutil
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out_dir: str | None = None) -> str:
    out_dir = out_dir or os.path.join(ROOT, "dist")
    os.makedirs(out_dir, exist_ok=True)
    base = os.path.join(out_dir, "etl_rs_spark")
    path = shutil.make_archive(base, "zip", root_dir=ROOT, base_dir="etl_rs_spark")
    return path


if __name__ == "__main__":
    print(build(sys.argv[1] if len(sys.argv) > 1 else None))
