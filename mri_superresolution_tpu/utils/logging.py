"""Logging: human logs + the JSON-lines stdout protocol the TUI consumes.

Message protocol parity with the reference (scripts/train.py:54-91): every
message is one JSON object per line on stdout with a ``type`` field —
``params`` / ``batch_update`` / ``epoch_summary`` / ``info`` — and float
values rounded to 6 decimals. Human-readable mirrors go to the standard
logger (file + console), with batch updates suppressed there.
"""

from __future__ import annotations

import json
import logging
import sys
from typing import Union


def setup_logging(logfile: str = "training.log",
                  name: str = "mri_superresolution_tpu") -> logging.Logger:
    logger = logging.getLogger(name)
    # child loggers (e.g. ...tpu.infer) must not re-emit through the root
    # package logger's handlers — that double-prints every line
    logger.propagate = False
    if not logger.handlers:
        logger.setLevel(logging.INFO)
        fmt = logging.Formatter("%(asctime)s - %(levelname)s - %(message)s")
        sh = logging.StreamHandler(sys.stderr)
        sh.setFormatter(fmt)
        logger.addHandler(sh)
        try:
            fh = logging.FileHandler(logfile)
            fh.setFormatter(fmt)
            logger.addHandler(fh)
        except OSError:
            pass
    return logger


_logger = logging.getLogger("mri_superresolution_tpu")

# Multi-host training: the stdout JSON protocol must speak with ONE voice
# (the TUI/evaluate drivers consume a single stream), so non-main processes
# set this and keep only their per-process human log (parallel/multihost.py).
_quiet = False


def set_quiet(quiet: bool = True) -> None:
    """Suppress the stdout protocol lines (non-main multi-host processes)."""
    global _quiet
    _quiet = quiet


def log_message(message: Union[dict, str], message_type: str = "info") -> None:
    """Emit one protocol line on stdout + a human line on the logger."""
    if _quiet:
        if message_type != "batch_update":
            _logger.info(message if isinstance(message, str)
                         else json.dumps(message))
        return
    if isinstance(message, dict):
        json_message = dict(message)
        for key, value in json_message.items():
            if isinstance(value, float):
                json_message[key] = round(value, 6)
        json_message["type"] = message_type
        print(json.dumps(json_message), flush=True)
    else:
        print(json.dumps({"type": message_type, "message": str(message)}),
              flush=True)

    if message_type == "batch_update":
        return  # too chatty for the human log (scripts/train.py:71-73)
    if isinstance(message, dict):
        if message_type == "epoch_summary":
            msg = (f"Epoch {message['epoch'] + 1}/"
                   f"{message.get('total_epochs', '?')} | "
                   f"Train Loss: {message.get('train_loss', 0):.4f} | "
                   f"Train SSIM: {message.get('train_ssim', 0):.4f}")
            if message.get("val_loss") != "N/A":
                msg += (f" | Val Loss: {message.get('val_loss', 0):.4f}"
                        f" | Val SSIM: {message.get('val_ssim', 0):.4f}")
            msg += f" | Time: {message.get('elapsed', 0):.2f}s"
            _logger.info(msg)
        elif message_type == "params":
            params_str = ", ".join(f"{k}={v}" for k, v in message.items()
                                   if k != "type")
            _logger.info(f"Training Parameters: {params_str}")
    else:
        if message_type == "warning":
            _logger.warning(str(message))
        else:
            _logger.info(str(message))
