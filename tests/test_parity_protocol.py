"""The parity-protocol runner itself is tested (smoke mode), so when real
data finally appears (TODO.md #1) the unblocking command is known-good
rather than first-run code."""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.run_parity_protocol import PAPER_TARGETS, PROTOCOL, main, readiness


def test_readiness_reports_synthetic_fallback(tmp_path):
    st = readiness(str(tmp_path / "nodata"))
    assert set(st["configs"]) == set(PROTOCOL)
    # this image has no dataset files: every loadable config reports the
    # synthetic fallback, and the session-0 checklist rides along
    for key, spec in PROTOCOL.items():
        if "cfg" in spec:
            assert st["configs"][key]["data"] == "synthetic"
    assert st["session0_checklist"]


def test_smoke_run_end_to_end(tmp_path):
    out = tmp_path / "parity_report.json"
    report = main(["--smoke", "--configs", "1,5",
                   "--snapshot_dir", str(tmp_path / "snap"),
                   "--data_dir", str(tmp_path / "nodata"),
                   "--out", str(out)])
    row = report["configs"]["1"]
    assert row["status"] == "ran" and row["data_source"] == "synthetic"
    assert row["test_nll"] == row["test_nll"]  # finite
    # no paper target filled in -> no delta claimed
    assert PAPER_TARGETS["1"] is None and "delta_nats" not in row
    clf = report["configs"]["5"]
    assert clf["status"] == "ran"
    assert 0.0 <= clf["exemplar_augmented_test_error"] <= 1.0
    assert json.loads(out.read_text())["smoke"] is True


def test_non_smoke_refuses_synthetic_parity(tmp_path):
    report = main(["--configs", "1", "--max_epochs", "1",
                   "--snapshot_dir", str(tmp_path / "snap2"),
                   "--data_dir", str(tmp_path / "nodata"),
                   "--out", str(tmp_path / "r.json")])
    assert report["configs"]["1"]["status"].startswith("blocked")
