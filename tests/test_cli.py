"""Black-box CLI test (reference S6 flag parity), own JVM via
subprocess — the reference-compatible entry a switching user runs."""

from __future__ import annotations

import json
import subprocess
import sys


def test_cli_generate_and_color(tmp_path):
    g = tmp_path / "g.json"
    c = tmp_path / "c.json"
    proc = subprocess.run(
        [
            sys.executable,
            "-m",
            "distributed_graph_coloring_with_pyspark_spark.cli",
            "--node-count",
            "30",
            "--max-degree",
            "4",
            "--seed",
            "7",
            "--output-graph",
            str(g),
            "--output-coloring",
            str(c),
        ],
        capture_output=True,
        text=True,
        timeout=300,
        cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "Validation result: True" in proc.stdout

    # independent (non-Spark) oracle on the saved files
    graph = {n["id"]: set(n["neighbors"]) for n in json.loads(g.read_text())}
    colors = {r["id"]: r["color"] for r in json.loads(c.read_text())}
    assert set(colors) == set(graph)
    assert all(v >= 0 for v in colors.values())  # no failed-save sentinel
    assert not [
        (u, v) for u in graph for v in graph[u] if colors[u] == colors[v]
    ], "monochromatic edge"


def test_cli_jsonl_output(tmp_path):
    """--output-format jsonl drives the DISTRIBUTED sink (executor-side
    df.write.json, no driver collect) end-to-end, then re-reads the
    JSON-lines directory and validates the coloring independently."""
    g = tmp_path / "g.json"
    c = tmp_path / "colors_jsonl"
    proc = subprocess.run(
        [
            sys.executable,
            "-m",
            "distributed_graph_coloring_with_pyspark_spark.cli",
            "--node-count",
            "30",
            "--max-degree",
            "4",
            "--seed",
            "7",
            "--output-graph",
            str(g),
            "--output-coloring",
            str(c),
            "--output-format",
            "jsonl",
        ],
        capture_output=True,
        text=True,
        timeout=300,
        cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "Validation result: True" in proc.stdout

    colors = {}
    for part in c.glob("part-*.json"):
        for line in part.read_text().splitlines():
            rec = json.loads(line)
            colors[rec["id"]] = rec["color"]
    graph = {n["id"]: set(n["neighbors"]) for n in json.loads(g.read_text())}
    assert set(colors) == set(graph)
    assert all(v >= 0 for v in colors.values())
    assert not [
        (u, v) for u in graph for v in graph[u] if colors[u] == colors[v]
    ], "monochromatic edge"
