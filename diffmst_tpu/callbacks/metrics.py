"""Scalar metric sinks: CSV always, wandb when available.

The reference logs through Lightning's WandbLogger
(configs/config.yaml:5-10); wandb is optional here (not in the image) and
degrades to CSV.
"""

from __future__ import annotations

import csv
import os
from typing import Dict, Optional

__all__ = ["CSVLogger", "WandbLogger"]


class CSVLogger:
    def __init__(self, path: str = "logs/metrics.csv") -> None:
        self.path = path
        self._fieldnames: Optional[list] = None

    def on_log(self, tag: str, metrics: Dict[str, float]) -> None:
        os.makedirs(os.path.dirname(os.path.abspath(self.path)), exist_ok=True)
        row = {"tag": tag, **metrics}
        write_header = not os.path.exists(self.path)
        if self._fieldnames is None or any(
            k not in self._fieldnames for k in row
        ):
            self._fieldnames = sorted(set(self._fieldnames or []) | set(row))
            # rewrite header only on fresh files; appended rows may have
            # missing keys which DictWriter fills with ''
            if not write_header:
                pass
        with open(self.path, "a", newline="") as f:
            w = csv.DictWriter(f, fieldnames=self._fieldnames, extrasaction="ignore")
            if write_header:
                w.writeheader()
            w.writerow(row)


class WandbLogger:
    def __init__(self, project: str = "DiffMST", **init_kwargs) -> None:
        try:
            import wandb

            self._run = wandb.init(project=project, **init_kwargs)
            self._wandb = wandb
        except Exception:
            self._run = None
            self._wandb = None

    def on_log(self, tag: str, metrics: Dict[str, float]) -> None:
        if self._run is not None:
            self._wandb.log({f"{tag}/{k}": v for k, v in metrics.items()})
