from __future__ import annotations

import pytest

from distributed_graph_coloring_with_pyspark_spark.session import get_spark

SF0001 = "/root/testdata/sf0.001"
SF001 = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    # small core count: tiny test frames, task-launch overhead dominates
    s = get_spark(
        app_name="dgc-tests",
        cpus=4,
        shuffle_partitions=4,
        extra_conf={
            # bucketed-table tests write managed tables; keep them off the repo
            "spark.sql.warehouse.dir": str(tmp_path_factory.mktemp("warehouse")),
        },
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s
