"""jit helpers.

Buffer donation of the frame history avoids an HBM copy of the accumulation
buffers each frame, but the remote-TPU PJRT plugin used in some environments
(axon tunnel) rejects donated executions with INVALID_ARGUMENT and reports
itself as a plain "tpu" platform, so it cannot be auto-detected. Donation is
therefore opt-in via KPT_DONATE=1.
"""

from __future__ import annotations

import os


def donate_history_kwargs() -> dict:
    """kwargs for jax.jit: donate the loop-carried history when enabled."""
    if os.environ.get("KPT_DONATE", "0") == "1":
        return {"donate_argnames": ("history",)}
    return {}
