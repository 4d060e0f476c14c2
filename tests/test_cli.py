"""EP3 CLI smoke tests over snapshot-shaped parquet dims."""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from drugbankner_spark import cli  # noqa: E402
from drugbankner_spark.fixtures import mini_synonymizer_frames  # noqa: E402


@pytest.fixture(scope="module")
def dims_dir(spark):
    d = tempfile.mkdtemp(prefix="dims_")
    nodes, clusters, edges = mini_synonymizer_frames(spark)
    nodes.write.parquet(os.path.join(d, "nodes.parquet"))
    clusters.write.parquet(os.path.join(d, "clusters.parquet"))
    edges.write.parquet(os.path.join(d, "edges.parquet"))
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_canonical_mode(dims_dir, capsys):
    rc = cli.main(["chebi:100", "--dims", dims_dir, "-c"])
    out = capsys.readouterr().out
    assert rc == 0 and "CHEBI:100" in out and "Aspirin" in out


def test_cluster_table_default_mode(dims_dir, capsys):
    rc = cli.main(["Aspirin", "--dims", dims_dir])
    out = capsys.readouterr().out
    assert rc == 0 and "MESH:300" in out


def test_miss_returns_nonzero(dims_dir, capsys):
    rc = cli.main(["definitely-not-a-thing", "--dims", dims_dir])
    assert rc == 1
    assert "not recognized" in capsys.readouterr().out


def test_bad_kg_version_rejected(dims_dir):
    with pytest.raises(SystemExit):
        cli.main(["x", "--dims", dims_dir, "--kg-version", "not.a.version!"])


def test_gpu_task_resources_conf_keys():
    # X1 GPU surface (reference perform_NER.py:16 spacy.require_gpu()):
    # the helper emits exactly the Spark resource-scheduling confs; the
    # builder accepts them via extra_conf.
    from drugbankner_spark.session import gpu_task_resources

    conf = gpu_task_resources()
    assert conf["spark.task.resource.gpu.amount"] == "1.0"
    assert conf["spark.executor.resource.gpu.amount"] == "1"
    assert "spark.executor.resource.gpu.discoveryScript" not in conf

    conf = gpu_task_resources(
        gpus_per_task=0.5, gpus_per_executor=2,
        discovery_script="/opt/spark/getGpusResources.sh",
    )
    assert conf["spark.task.resource.gpu.amount"] == "0.5"
    assert conf["spark.executor.resource.gpu.amount"] == "2"
    assert conf["spark.executor.resource.gpu.discoveryScript"].endswith(
        "getGpusResources.sh"
    )
