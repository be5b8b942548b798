"""The runnable examples must stay runnable (subprocess smoke — each
spawns its own SparkSession exactly as a user would)."""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args):
    return subprocess.run(
        [sys.executable] + args, cwd=REPO, capture_output=True, text=True,
        timeout=600)


def test_garnet_workflow_example():
    r = _run(["examples/garnet_workflow.py"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "Prp" in r.stdout and "Alm" in r.stdout


def test_embedding_curation_example(tmp_path):
    out = str(tmp_path / "emb")
    r = _run(["examples/embedding_curation.py",
              "/root/testdata/sf0.001/embeddings.parquet", out])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "semantic dedup:" in r.stdout
    assert "index store written" in r.stdout
    assert os.path.isdir(os.path.join(out, "ivf_store"))


def test_media_curation_example(tmp_path):
    out = str(tmp_path / "media")
    r = _run(["examples/media_curation.py", "/root/testdata/sf0.001", out])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "media dedup: kept" in r.stdout
    assert "audio near-dup pairs" in r.stdout
    assert os.path.isdir(os.path.join(out, "phash_store"))
    assert os.path.isdir(os.path.join(out, "features"))


def test_corpus_curation_example(tmp_path):
    out = str(tmp_path / "curated")
    r = _run(["examples/corpus_curation.py",
              "/root/testdata/sf0.001/documents.parquet", out])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "signature/winnow stores" in r.stdout
    assert "incremental span-match candidates" in r.stdout
    assert os.path.isdir(os.path.join(out, "corpus"))
    assert os.path.isdir(os.path.join(out, "sigstore"))
    assert os.path.isdir(os.path.join(out, "winnowstore"))
