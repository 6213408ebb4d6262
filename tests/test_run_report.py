"""run_report tool: summarizes the JSONL metrics mirror of a run."""

import json
import os

from custom_alphazero_tpu import paths
from custom_alphazero_tpu.tools.run_report import load, summarize


def test_run_report_summary(tmp_path):
    tb = paths.tensorboard_path(str(tmp_path), "connect_n", "rr1")
    os.makedirs(tb)
    rows = (
        [{"tag": "train/loss", "step": s, "value": 3.0 - 0.01 * s}
         for s in range(1, 101)]
        + [{"tag": "self_play/sims_per_second", "step": s, "value": 1e6}
           for s in (20, 40, 60)]
        + [{"tag": "self_play/games", "step": s, "value": 256}
           for s in (20, 40, 60)]
        + [{"tag": "self_play/samples", "step": s, "value": 4000}
           for s in (20, 40, 60)]
        + [{"tag": "evaluation/winning_score", "step": 50, "value": 0.60},
           {"tag": "evaluation/winning_score", "step": 100, "value": 0.50},
           {"tag": "evaluation/solver_score", "step": 50, "value": 0.71}]
    )
    with open(os.path.join(tb, "metrics.jsonl"), "w") as fp:
        for row in rows:
            fp.write(json.dumps(row) + "\n")

    report = summarize(load(str(tmp_path), "connect_n", "rr1"))
    assert report["steps"] == 100
    assert report["loss_first"] > report["loss_last"]
    assert report["loss_min"] == 2.0
    assert report["sims_per_s_median"] == 1_000_000
    assert report["generations"] == 3
    assert report["games_total"] == 768
    assert report["samples_total"] == 12000
    assert report["arenas"] == 2
    assert report["promotions"] == 1  # only the 0.60 arena clears 0.55
    assert report["solver_score_history"] == [(50, 0.71)]
    # Elo: one promotion at 0.60 -> 400*log10(0.6/0.4) ~ +70.4; the
    # non-promoted 0.50 arena adds nothing.
    assert report["elo_history"] == [(50, 70.4)]
    assert report["elo_gain"] == 70.4


def test_elo_history_caps_sweeps():
    from custom_alphazero_tpu.tools.run_report import elo_history

    hist = elo_history([(10, 1.0), (20, 0.55)])
    assert len(hist) == 2
    assert hist[0][1] < 800          # clean sweep clipped, finite
    assert hist[1][1] > hist[0][1]   # cumulative
