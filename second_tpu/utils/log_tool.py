"""Training logger (reference second/utils/log_tool.py SimpleModelLog).

Writes the same sinks: log.txt, json-lines metrics (log.json.lst) and —
when tensorboard is importable — scalar summaries, under
model_dir/summary.
"""

import json
import time
from pathlib import Path


def _flatten(metrics, prefix=""):
    out = {}
    for k, v in metrics.items():
        key = f"{prefix}{k}"
        if isinstance(v, dict):
            out.update(_flatten(v, key + "."))
        else:
            try:
                out[key] = float(v)
            except (TypeError, ValueError):
                out[key] = v
    return out


def metric_to_str(metrics, sep=", "):
    parts = []
    for k, v in _flatten(metrics).items():
        if isinstance(v, float):
            parts.append(f"{k}={v:.4g}")
        else:
            parts.append(f"{k}={v}")
    return sep.join(parts)


class SimpleModelLog:
    def __init__(self, model_dir, disable_tensorboard=False):
        self.model_dir = Path(model_dir)
        self.log_file = None
        self.log_mjson_file = None
        self.summary_writer = None
        self._disable_tb = disable_tensorboard

    def open(self):
        model_dir = self.model_dir
        model_dir.mkdir(parents=True, exist_ok=True)
        summary_dir = model_dir / "summary"
        summary_dir.mkdir(parents=True, exist_ok=True)
        self.log_file = open(model_dir / "log.txt", "a")
        self.log_mjson_file = open(model_dir / "log.json.lst", "a")
        if not self._disable_tb:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self.summary_writer = SummaryWriter(str(summary_dir))
            except Exception:
                self.summary_writer = None
        return self

    def close(self):
        if self.log_file:
            self.log_file.close()
        if self.log_mjson_file:
            self.log_mjson_file.close()
        if self.summary_writer is not None:
            self.summary_writer.close()

    def log_text(self, text, step, tag="log"):
        print(text)
        print(text, file=self.log_file)
        self.log_file.flush()
        if self.summary_writer is not None:
            self.summary_writer.add_text(tag, text, step)

    def log_metrics(self, metrics, step):
        flat = _flatten(metrics)
        record = {"step": int(step), "time": time.time(), **flat}
        print(json.dumps(record), file=self.log_mjson_file)
        self.log_mjson_file.flush()
        print(f"step={step}, " + metric_to_str(metrics))
        print(
            f"step={step}, " + metric_to_str(metrics), file=self.log_file)
        self.log_file.flush()
        if self.summary_writer is not None:
            for k, v in flat.items():
                if isinstance(v, float):
                    self.summary_writer.add_scalar(k, v, step)
