"""Face-track-rate: the automated sample-quality proxy.

The reference's quantitative eval runs its own face tracker over generated
GIFs with relaxed thresholds and counts how many produce a valid face track
(models/survey_samples_test_results/*/params.txt: min_frame_count 6,
min_total_detections 3, max_skip 2; stats.txt e.g. 201/250 for the rnn set).
Same idea here: feed generated clips through gifgan_tpu.track.pipeline and
report the fraction that yield >= 1 final track.
"""

from __future__ import annotations

import os
from dataclasses import replace
from typing import Callable, Dict, List, Optional, Sequence

import numpy as np

from gifgan_tpu.core.config import TrackConfig
from gifgan_tpu.track.pipeline import process_video
from gifgan_tpu.track.stats import TrackStats

# relaxed thresholds used for generated-sample eval (reference params.txt)
EVAL_TRACK_CONFIG = TrackConfig(min_frame_count=6, min_total_detections=3,
                                max_skip=2, target_size=64)


def face_track_rate(clips: Sequence[np.ndarray], detector: Callable,
                    cfg: Optional[TrackConfig] = None,
                    ) -> Dict:
    """clips: iterable of (T, H, W, C) uint8 videos (generated samples).
    Returns {"rate", "tracked", "total", "stats"}."""
    cfg = cfg or EVAL_TRACK_CONFIG
    stats = TrackStats()
    stats.total_files = len(clips)
    tracked = 0
    for clip in clips:
        before = stats.cnt_final_tracks
        try:
            process_video(np.asarray(clip), detector, cfg, stats)
            stats.cnt_files_processed += 1
        except Exception:
            stats.cnt_files_errored += 1
            continue
        if stats.cnt_final_tracks > before:
            tracked += 1
    total = len(clips)
    return {
        "rate": tracked / total if total else 0.0,
        "tracked": tracked,
        "total": total,
        "stats": stats,
    }


def track_rate_report(results_by_variant: Dict[str, Dict],
                      out_dir: Optional[str] = None) -> str:
    """Render per-variant track rates (the stats.txt-per-variant layout of
    models/survey_samples_test_results/)."""
    lines = ["# face-track-rate eval", ""]
    for name, res in sorted(results_by_variant.items()):
        lines.append(f"{name}: {res['tracked']}/{res['total']} "
                     f"({100.0 * res['rate']:.1f}%)")
        if out_dir:
            res["stats"].write(os.path.join(out_dir, f"{name}_results"))
    text = "\n".join(lines) + "\n"
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
        with open(os.path.join(out_dir, "summary.txt"), "w") as f:
            f.write(text)
    return text
