"""Collect the corpus-scaling curve (r4 VERDICT #3) into one artifact.

Reads the detect_results.json of each scaling fold
(runs/detector_ckpt_scaleNNNN_002160, trained by scripts/run_fold_queue.sh
from scripts/fold_queue_r5b.txt: prefix subsets of the 2,700-scan
v2-realism corpus mixed into the 002160 fold, fixed 240-epoch budget,
unbiased protocol — selection by train-pooled F1, held-out 002160
reported at the selected checkpoint) plus the base fold (size 0) and
writes runs/corpus_scaling.json with one row per corpus size.

Run after the phase-2 queue: python scripts/collect_scaling_curve.py
"""

import glob
import json
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def epoch_stats(ckpt_dir: str) -> dict:
    """Median steady-state epoch time + total train wall from log.jsonl
    (first epoch carries the XLA compile; exclude it from the median).
    The r4 VERDICT's scaling ask includes 'data-path + train throughput
    at the largest size' — time_s covers the full epoch: host batch
    assembly, device_cache feed, train steps, fenced fetch."""
    times = []
    for line in open(os.path.join(ckpt_dir, "log.jsonl")):
        rec = json.loads(line)
        if "time_s" in rec:
            # log.jsonl appends across retrains/resumes; keep only the
            # latest run by restarting at each epoch-1 marker.
            if rec.get("epoch") == 1:
                times = []
            times.append(float(rec["time_s"]))
    if len(times) < 2:
        return {}
    steady = sorted(times[1:])
    return {
        "epoch_time_s_median": steady[len(steady) // 2],
        "train_wall_s_total": round(sum(times), 1),
        "epochs": len(times),
    }


def row(ckpt_dir: str, size: int) -> dict:
    path = os.path.join(ckpt_dir, "detect_results.json")
    d = json.load(open(path))
    vm = d["val_metrics"]
    held = d["detect"].get("002160", {})
    dedup = held.get("thr0.35_dedup", {})
    return {
        **epoch_stats(ckpt_dir),
        "corpus_scans": size,
        "ckpt": os.path.relpath(ckpt_dir, REPO),
        "test_f1": round(vm["test_f1"], 4),
        "test_precision": round(vm["test_precision"], 4),
        "test_recall": round(vm["test_recall"], 4),
        "best_epoch": vm["best_epoch"],
        "test_f1_biased_max": round(vm["test_f1_biased_max"], 4),
        "heldout_dedup_f1@0.35": round(dedup.get("f1", 0.0), 4),
        "heldout_dedup_recall@0.35": round(dedup.get("recall", 0.0), 4),
    }


def plot(rows):
    """runs/corpus_scaling.png — held-out F1 vs synthetic-corpus size.

    Ordinal x (0 can't sit on a log axis; sizes are the designed levels,
    not a continuum). Two series on ONE axis, hues from a pre-validated
    categorical palette (slots 1-2: CVD-safe adjacent pair), biased
    upper bound as a neutral dashed reference line, recessive grid,
    text in neutral ink."""
    if len(rows) < 2:
        return
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    ink, muted = "#333330", "#73726c"
    xs = list(range(len(rows)))
    labels = [str(r["corpus_scans"]) for r in rows]
    fig, ax = plt.subplots(figsize=(6.4, 3.6), dpi=150)
    ax.plot(xs, [r["test_f1"] for r in rows], color="#2a78d6",
            linewidth=1.8, marker="o", markersize=6,
            label="held-out F1 @0.35 (unbiased)")
    ax.plot(xs, [r["heldout_dedup_f1@0.35"] for r in rows],
            color="#eb6834", linewidth=1.8, marker="s", markersize=6,
            label="end-to-end dedup F1 @0.35")
    ax.plot(xs, [r["test_f1_biased_max"] for r in rows], color="#a8a7a0",
            linewidth=1.2, linestyle="--", marker="", label=
            "max-over-epochs upper bound (biased)")
    ax.set_xticks(xs, labels)
    ax.set_xlabel("synthetic scans mixed into the fold "
                  "(v2 realism, held-out 002160)", color=ink)
    ax.set_ylabel("held-out F1", color=ink)
    ax.set_ylim(bottom=0)
    ax.grid(axis="y", color="#e5e4df", linewidth=0.7)
    ax.set_axisbelow(True)
    for s in ("top", "right"):
        ax.spines[s].set_visible(False)
    for s in ("left", "bottom"):
        ax.spines[s].set_color("#c9c8c2")
    ax.tick_params(colors=muted, labelsize=9)
    ax.legend(frameon=False, fontsize=8, labelcolor=ink, loc="upper left")
    fig.tight_layout()
    out = os.path.join(REPO, "runs", "corpus_scaling.png")
    fig.savefig(out)
    plt.close(fig)
    print("wrote", out)


def main():
    rows = [row(os.path.join(REPO, "runs", "detector_ckpt_002160"), 0)]
    for d in sorted(glob.glob(os.path.join(REPO, "runs",
                                           "detector_ckpt_scale*_002160"))):
        m = re.search(r"scale(\d+)_", d)
        if os.path.exists(os.path.join(d, "detect_results.json")):
            rows.append(row(d, int(m.group(1))))
    out = {
        "protocol": (
            "unbiased: checkpoint selected by train-pooled F1 over the 3 "
            "golden train scans; held-out 002160 F1 reported at that fixed "
            "checkpoint. biased_max = max-over-epochs on the held-out scan "
            "(pre-r5 protocol), kept as a labeled upper bound."
        ),
        "corpus": "runs/synthgen_scale_v2 (v2 realism, seed 20260819), "
                  "MIX_N prefix subsets; 240 epochs each",
        "rows": rows,
    }
    plot(rows)
    path = os.path.join(REPO, "runs", "corpus_scaling.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(rows, indent=2))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
