"""CLI entry (reference S6: coloring.py:165-243, README.md:60-66).

Flag parity with the reference: ``--input``, ``--node-count``,
``--max-degree``, ``--output-graph``, ``--output-coloring`` (required).

Deliberate divergence (documented, SURVEY.md §2.8 G7): on a failed
descent attempt the reference still saves that attempt's *partial*
coloring (coloring.py:215-241; the committed colors.json contains
``"color": -1``). We save the last *successful* coloring.
"""

from __future__ import annotations

import argparse
import time

from .operators.coloring import minimal_coloring, validate_coloring
from .session import get_spark
from .sources.generator import generate_graph
from .sources.graph_json import (
    read_graph_json,
    write_coloring_json,
    write_coloring_jsonl,
    write_graph_json,
)


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description="Distributed graph coloring (PySpark DataFrame engine)")
    p.add_argument("--input", help="input graph JSON (reference format)")
    p.add_argument("--node-count", type=int, default=100)
    p.add_argument("--max-degree", type=int, default=5)
    p.add_argument("--output-graph", help="where to save the (generated) graph JSON")
    p.add_argument("--output-coloring", required=True)
    p.add_argument(
        "--output-format",
        choices=["json", "jsonl"],
        default="json",
        help="json = the reference's single pretty-printed array (driver-side"
        " write); jsonl = distributed executor-side JSON-lines directory, the"
        " layout a cluster-scale result actually ships in",
    )
    p.add_argument("--seed", type=int, default=42)
    args = p.parse_args(argv)

    spark = get_spark("dgc-coloring-cli")
    t0 = time.time()
    if args.input:
        node_ids, edges = read_graph_json(spark, args.input)
    else:
        node_ids, edges = generate_graph(spark, args.node_count, args.max_degree, args.seed)
        if args.output_graph:
            write_graph_json(node_ids, edges, args.output_graph)

    result = minimal_coloring(node_ids, edges)
    valid, n_uncolored, conflicts = validate_coloring(result.vertices, edges)
    print(f"Minimal colors: {result.minimal_colors}")
    print(f"Validation result: {valid} (uncolored={n_uncolored}, conflict_rows={conflicts})")
    print(f"Attempts (k, success, rounds): {result.attempts}")
    solve_s = time.time() - t0
    t1 = time.time()
    if args.output_format == "jsonl":
        write_coloring_jsonl(result.vertices, args.output_coloring)
    else:
        write_coloring_json(result.vertices, args.output_coloring)
    # write timed separately so the reported wall clock covers the WHOLE
    # run (review r5: the old single line was printed before the write)
    print(f"Total time: {solve_s + (time.time() - t1):.2f} s (solve {solve_s:.2f} s)")
    spark.stop()
    return 0 if valid else 1


if __name__ == "__main__":
    raise SystemExit(main())
