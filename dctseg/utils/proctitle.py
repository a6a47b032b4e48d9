"""Process-title progress display, dependency-free.

The reference announces driver progress in ``ps`` via setproctitle
(train.py:120 'Training!', test*.py:146 'Testing!').  That package is not
available here; on Linux the same capability is ``/proc/self/comm`` (the
kernel thread name, 15 chars + NUL), which ps/top/htop all display.
"""

from __future__ import annotations

import logging

logger = logging.getLogger("dctseg")

_COMM_MAX = 15  # TASK_COMM_LEN - 1


def set_process_title(title: str) -> bool:
    """Best-effort: set the kernel task name shown by ps/top.

    Returns True when the title was applied.  Silently no-ops on platforms
    without /proc/self/comm (macOS, sandboxes that mount /proc read-only).
    """
    try:
        with open("/proc/self/comm", "w") as f:
            f.write(title[:_COMM_MAX])
        return True
    except OSError:
        logger.debug("process title unsupported on this platform")
        return False
