"""Shared helper for pytest-side DuckDB-oracle comparisons: reuses the
driver-contract ``canon`` from tools/check_oracle.py so pytest gates and
the local oracle gate can never canonicalize differently."""

from __future__ import annotations

from tools.check_oracle import canon


def canon_rows(cols, rows):
    """Order-insensitive canonical form: columns sorted by name, rows
    sorted, every value through the driver-contract canon."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(canon(r[i]) for i in order) for r in rows)
