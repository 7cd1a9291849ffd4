"""Training observability: loss accumulation, log files, image dumps.

Parity with the reference `Visualizer`
(reference: pointnerf/utils/visualizer.py:38-182): append-only log.txt,
windowed loss averages with automatic PSNR for `*raycolor` losses,
`step-%04d-<name>.png` image dumps, and point-cloud text dumps. JSONL
metrics replace tensorboardX.
"""

from __future__ import annotations

import json
import os
import time
from collections import defaultdict
from typing import Dict, Optional

import numpy as np


def mse2psnr(mse: float) -> float:
    return float(-10.0 * np.log10(max(mse, 1e-12)))


class Logger:
    def __init__(self, out_dir: str, name: str = "train",
                 tensorboard: bool = False):
        self.out_dir = out_dir
        os.makedirs(out_dir, exist_ok=True)
        self.log_path = os.path.join(out_dir, "log.txt")
        self.metrics_path = os.path.join(out_dir, f"{name}_metrics.jsonl")
        self._acc: Dict[str, list] = defaultdict(list)
        self._t0 = time.time()
        self._last_step = 0
        # tensorboard scalar export (reference visualizer.py:47-52,
        # 176-182: tensorboardX add_scalar per loss key per step).
        # Optional + lazy: missing tensorboard degrades to jsonl-only.
        self._tb = None
        if tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter
                self._tb = SummaryWriter(
                    log_dir=os.path.join(out_dir, "tensorboard"))
            except Exception as e:       # pragma: no cover
                print(f"logger: tensorboard unavailable ({e}); "
                      "scalars go to jsonl only")

    def accumulate(self, losses: Dict[str, float]) -> None:
        """Store values AS-IS — device scalars stay on device. A
        float() here would block on the step's full computation every
        iteration, serializing host and device (on a remote-tunnel
        backend that sync alone can triple the step time); flush()
        fetches the whole window in one transfer instead."""
        for k, v in losses.items():
            self._acc[k].append(v)

    def flush(self, step: int, extra: Optional[Dict] = None) -> Dict[str, float]:
        """Windowed averages since last flush; auto-PSNR for raycolor."""
        try:
            import jax
            acc = jax.device_get(dict(self._acc))
        except Exception:
            acc = self._acc
        # entries are scalars or [k]-stacked arrays (multi-step
        # dispatch windows); uniform window lengths keep this an exact
        # per-step mean
        avg = {k: float(np.mean([np.mean(np.asarray(x)) for x in v]))
               for k, v in acc.items() if v}
        for k in list(avg):
            if k.endswith("raycolor_loss"):
                avg[k.replace("_loss", "_psnr")] = mse2psnr(avg[k])
        dt = time.time() - self._t0
        ips = (step - self._last_step) / dt if dt > 0 else 0.0
        rec = {"step": step, "it_per_sec": round(ips, 3), **avg,
               **(extra or {})}
        line = " ".join(f"{k}={v:.6g}" if isinstance(v, float) else f"{k}={v}"
                        for k, v in rec.items())
        print(line)
        with open(self.log_path, "a") as f:
            f.write(line + "\n")
        with open(self.metrics_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        if self._tb is not None:
            for k, v in avg.items():
                self._tb.add_scalar(k, v, step)
            self._tb.add_scalar("it_per_sec", ips, step)
            self._tb.flush()
        self._acc.clear()
        self._t0 = time.time()
        self._last_step = step
        return rec

    def save_image(self, step: int, name: str, img: np.ndarray) -> str:
        from PIL import Image

        path = os.path.join(self.out_dir, f"step-{step:04d}-{name}.png")
        img8 = (np.clip(img, 0, 1) * 255).astype(np.uint8)
        Image.fromarray(img8).save(path)
        return path

    def save_neural_points(self, step: int, xyz: np.ndarray,
                           color: Optional[np.ndarray] = None) -> str:
        """Semicolon-delimited point dump (visualizer.py:97-121 parity)."""
        path = os.path.join(self.out_dir, f"step-{step:04d}-points.txt")
        color = color if color is not None else np.ones_like(xyz)
        with open(path, "w") as f:
            for p, c in zip(xyz, color):
                f.write(";".join(f"{v:.6f}" for v in (*p, *c)) + "\n")
        return path
