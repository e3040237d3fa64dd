"""Logging (reference utils/log_utils.py:60-140).

Console logger with level from macros; optional rotating file handler.
"""

from __future__ import annotations

import logging
import logging.handlers
from typing import Optional

from robosuite_tpu import macros

FORMAT_STR = "[robosuite_tpu %(levelname)s - %(asctime)s] %(message)s"


class DefaultLogger:
    def __init__(self, console_logging_level: Optional[str] = None, file_logging_level: Optional[str] = None):
        console_logging_level = console_logging_level or macros.CONSOLE_LOGGING_LEVEL
        file_logging_level = file_logging_level if file_logging_level is not None else macros.FILE_LOGGING_LEVEL
        logger = logging.getLogger("robosuite_tpu")
        if not logger.handlers:
            if console_logging_level:
                sh = logging.StreamHandler()
                sh.setLevel(getattr(logging, console_logging_level))
                sh.setFormatter(logging.Formatter(FORMAT_STR))
                logger.addHandler(sh)
            if file_logging_level:
                fh = logging.handlers.RotatingFileHandler(
                    "/tmp/robosuite_tpu.log", maxBytes=1 << 20, backupCount=3
                )
                fh.setLevel(getattr(logging, file_logging_level))
                fh.setFormatter(logging.Formatter(FORMAT_STR))
                logger.addHandler(fh)
            logger.setLevel(logging.DEBUG)

    def get_logger(self):
        return logging.getLogger("robosuite_tpu")


ROBOSUITE_TPU_DEFAULT_LOGGER = DefaultLogger().get_logger()
