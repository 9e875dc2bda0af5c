"""10× scaling probe for the r11 text/sampling ops on a MANY-FILE
corpus — the committed sf1 factors for corpus-linear text queries carry
the one-file-scan signature (the 50k-doc sf1 documents table is 2 input
splits, so per-task work grows ~5× with no parallelism to absorb it);
this probe replays the r5 pipeline-probe design (5k docs / 1 file →
50k docs / 10 files, per-replica char-remapped tokens so segments and
hashes don't collide across replicas) to measure the factor a real
many-file corpus would show.

    python tools/scale_probe_textops.py
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa  # noqa: E402
import pyarrow.parquet as pq  # noqa: E402

from distributed_graph_coloring_with_pyspark_spark.operators import text_dedup as TD  # noqa: E402
from distributed_graph_coloring_with_pyspark_spark.session import (  # noqa: E402
    get_spark,
    release_session_caches,
)

SF = "/root/testdata/sf0.1"

# distinct lowercase alphabets per replica: rotating the a-z ring keeps
# token lengths (and so segment/char counts) identical while making
# every replica's segment text globally unique
def _remap(text: str, k: int) -> str:
    if k == 0:
        return text
    table = str.maketrans(
        "abcdefghijklmnopqrstuvwxyz",
        "abcdefghijklmnopqrstuvwxyz"[k:] + "abcdefghijklmnopqrstuvwxyz"[:k],
    )
    return text.translate(table)


def build_10x(tmp: str) -> str:
    t = pq.read_table(os.path.join(SF, "documents.parquet"))
    docs = t.to_pylist()
    out_dir = os.path.join(tmp, "documents.parquet")
    os.makedirs(out_dir, exist_ok=True)
    n = len(docs)
    for k in range(10):
        rows = [
            {
                **d,
                "doc_id": d["doc_id"] + k * n,
                "text": _remap(d["text"], k),
            }
            for d in docs
        ]
        pq.write_table(
            pa.Table.from_pylist(rows, schema=t.schema),
            os.path.join(out_dir, f"part-{k:03d}.parquet"),
        )
    return tmp


def main() -> int:
    spark = get_spark(app_name="dgc-textops-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="dgc_textops_10x_")
    big = build_10x(tmp)

    fns = {
        "remove_boilerplate": TD.remove_boilerplate,
        "mixture_temperature_sample": TD.mixture_temperature_sample,
        "epoch_shuffle_manifest": TD.epoch_shuffle_manifest,
    }
    for label, sf_dir in (("1x (5k docs, 1 file)", SF), ("10x (50k docs, 10 files)", big)):
        release_session_caches(spark)
        print(f"--- {label} ---", flush=True)
        for name, fn in fns.items():
            last = None
            for _ in range(2):
                t0 = time.monotonic()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                last = time.monotonic() - t0
            print(f"{name}: {last:.1f} s (warm)", flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
