"""Fault-tolerant batch runner: checkpoint, resume, per-item failure isolation."""

import json
import os

import numpy as np
import pytest

from codec_tcc_tpu.config import EncodeConfig
from codec_tcc_tpu.io import dicom
from codec_tcc_tpu.parallel.runner import BatchRunner


@pytest.fixture()
def dicom_dir(tmp_path, rng):
    paths = []
    for i in range(3):
        img = rng.integers(0, 256, size=(32, 32)).astype(np.uint8)
        p = tmp_path / f"img{i}.dcm"
        dicom.save_image(img, str(p))
        paths.append(str(p))
    return tmp_path, paths


def test_runner_happy_path(dicom_dir):
    tmp_path, paths = dicom_dir
    out = tmp_path / "out"
    runner = BatchRunner(str(out), EncodeConfig(compute_metrics=True))
    results = runner.run(paths, "batch payload")
    assert [r.status for r in results] == ["done"] * 3
    assert all(os.path.exists(r.output) for r in results)
    manifest = json.loads((out / "manifest.json").read_text())
    assert len(manifest["items"]) == 3


def test_runner_resume_skips_done(dicom_dir):
    tmp_path, paths = dicom_dir
    out = tmp_path / "out"
    BatchRunner(str(out), EncodeConfig(compute_metrics=False)).run(paths[:2], "x")

    # new runner instance resumes from the manifest; done items keep their
    # original outputs (mtime unchanged)
    mtimes = {p: os.path.getmtime(os.path.join(out, f"img{i}.stgc"))
              for i, p in enumerate(paths[:2])}
    runner2 = BatchRunner(str(out), EncodeConfig(compute_metrics=False))
    results = runner2.run(paths, "x")
    assert [r.status for r in results] == ["done"] * 3
    for i, p in enumerate(paths[:2]):
        assert os.path.getmtime(os.path.join(out, f"img{i}.stgc")) == mtimes[p]


def test_runner_isolates_failures(dicom_dir, tmp_path):
    _, paths = dicom_dir
    bad = str(tmp_path / "missing.dcm")
    out = tmp_path / "out2"
    runner = BatchRunner(str(out), EncodeConfig(compute_metrics=False))
    results = runner.run([paths[0], bad, paths[1]], "y")
    statuses = {r.input: r.status for r in results}
    assert statuses[paths[0]] == "done"
    assert statuses[bad] == "failed"
    assert statuses[paths[1]] == "done"  # failure did not abort the batch
    assert runner.pending == [bad]

    # failed items re-run on resume
    results2 = BatchRunner(str(out), EncodeConfig(compute_metrics=False)).run([bad], "y")
    assert results2[0].status == "failed"
