"""CLI `doctor` surface: environment health report.

Host-only checks here (--no-device); the device probe leg runs a bounded
subprocess and is exercised on the real chip by the verify drive. The
codec round-trip statuses must agree with the registry's availability.
"""

import json

from codec_tcc_tpu.cli import main
from codec_tcc_tpu.io.codecs import available_names, names


def test_doctor_json_host_only(capsys):
    rc = main(["doctor", "--no-device", "--json"])
    assert rc == 0
    rep = json.loads(capsys.readouterr().out)
    assert rep["host_cores"] >= 1
    assert "device" not in rep
    # every registered codec is reported; every available one round-trips
    assert sorted(rep["codecs"]) == names()
    for name in available_names():
        assert rep["codecs"][name] == "ok", (name, rep["codecs"][name])
    assert isinstance(rep["competing_python"], list)


def test_doctor_human_output(capsys):
    rc = main(["doctor", "--no-device"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "transport codecs" in out
    assert "skipped (--no-device)" in out


def test_doctor_device_probe_on_cpu_backend(capsys):
    """The subprocess probe against this test env's CPU backend: the
    conftest re-exec strips the axon gate, so the child sees cpu too."""
    rc = main(["doctor", "--json", "--device-timeout", "120"])
    assert rc == 0
    rep = json.loads(capsys.readouterr().out)
    assert rep["device"]["ok"], rep["device"]
    assert rep["device"]["backend"] == "cpu"
    assert rep["device"]["device_count"] >= 1
