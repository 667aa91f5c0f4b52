"""File + console logging, parity with /root/reference/src/utils.py:218-269."""

from __future__ import annotations

import logging
import os
import sys
from datetime import datetime


def setup_logging(log_dir: str, experiment_name: str, log_level=logging.INFO) -> logging.Logger:
    os.makedirs(log_dir, exist_ok=True)
    logger = logging.getLogger(experiment_name)
    logger.setLevel(log_level)
    logger.handlers.clear()
    logger.propagate = False  # avoid double prints via root handlers (e.g. axon's)

    file_formatter = logging.Formatter(
        "%(asctime)s - %(name)s - %(levelname)s - %(message)s", datefmt="%Y-%m-%d %H:%M:%S")
    console_formatter = logging.Formatter(
        "%(asctime)s - %(levelname)s - %(message)s", datefmt="%H:%M:%S")

    timestamp = datetime.now().strftime("%Y%m%d_%H%M%S")
    log_filepath = os.path.join(log_dir, f"{experiment_name}_{timestamp}.log")
    file_handler = logging.FileHandler(log_filepath)
    file_handler.setLevel(log_level)
    file_handler.setFormatter(file_formatter)

    console_handler = logging.StreamHandler(sys.stdout)
    console_handler.setLevel(log_level)
    console_handler.setFormatter(console_formatter)

    logger.addHandler(file_handler)
    logger.addHandler(console_handler)
    logger.info(f"Logging initialized. Log file: {log_filepath}")
    return logger
