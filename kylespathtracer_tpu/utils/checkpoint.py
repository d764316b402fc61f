"""Checkpoint / resume.

The reference loses all state on exit (GPU textures + 3 global vec3s,
main.cpp:41-44). Here any pytree of frame state — history buffers, camera,
scene parameters, optimizer state, RNG counters — serializes with Orbax, so
a rendering or inverse-rendering run is deterministically resumable.
"""

from __future__ import annotations

from pathlib import Path

import jax


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save(directory, step: int, state) -> str:
    """Serialize a state pytree under `directory/step_{step}`; returns path."""
    path = Path(directory).resolve() / f"step_{step}"
    _checkpointer().save(path, state, force=True)
    return str(path)


def restore(directory, step: int | None = None, like=None):
    """Restore `(step, state)`; latest step if not given. Pass `like` (a
    pytree of the expected structure) to rebuild registered dataclasses —
    orbax returns plain nested dicts otherwise."""
    root = Path(directory).resolve()
    if step is None:
        steps = sorted(
            int(p.name.split("_", 1)[1])
            for p in root.glob("step_*")
            if p.name.split("_", 1)[1].isdigit()
        )
        if not steps:
            raise FileNotFoundError(f"no checkpoints under {root}")
        step = steps[-1]
    if like is not None:
        import orbax.checkpoint as ocp

        state = _checkpointer().restore(
            root / f"step_{step}", args=ocp.args.PyTreeRestore(item=like)
        )
    else:
        state = _checkpointer().restore(root / f"step_{step}")
    return step, state
