"""Named-element checkpoint registry ("Saver").

Re-design of `moe_pretrain_model/framework/helpers/saver.py`:
- register elements by name (`saver["model"] = state`); anything with
  `state_dict()/load_state_dict()` is serialized via JSON, jax pytrees via
  orbax (sharded, atomic);
- `tick(step)` saves every `save_interval` steps into `model-<step>/`;
- keep-last-k retention window; `latest_step()` auto-resume discovery;
- run args and the CompeteSMoE flip schedule ride along as JSON sidecars
  so resume restores the exact competition schedule (the reference
  serializes `prob_flips` as a module buffer, competesmoe.py:32).
"""

from __future__ import annotations

import json
import shutil
from pathlib import Path
from typing import Any, Dict, List, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _is_pytree_of_arrays(x) -> bool:
    leaves = jax.tree_util.tree_leaves(x)
    return (bool(leaves)
            and all(isinstance(l, (jax.Array, np.ndarray)) or np.isscalar(l)
                    for l in leaves)
            and any(isinstance(l, (jax.Array, np.ndarray)) for l in leaves))


class _NpEncoder(json.JSONEncoder):
    def default(self, o):
        if isinstance(o, np.integer):
            return int(o)
        if isinstance(o, np.floating):
            return float(o)
        if isinstance(o, np.ndarray):
            return o.tolist()
        return super().default(o)


class Saver:
    """Checkpoint registry with interval ticks and retention."""

    def __init__(self, ckpt_dir, save_interval: Optional[int] = None,
                 keep_last: int = 2):
        self.dir = Path(ckpt_dir)
        self.dir.mkdir(parents=True, exist_ok=True)
        self.save_interval = save_interval
        self.keep_last = keep_last
        self._elements: Dict[str, Any] = {}
        self._ckptr = ocp.PyTreeCheckpointer()

    def __setitem__(self, name: str, element: Any) -> None:
        self._elements[name] = element

    def __getitem__(self, name: str) -> Any:
        return self._elements[name]

    # -- save/load --

    def _step_dir(self, step: int) -> Path:
        return self.dir / f"model-{step}"

    def save(self, step: int) -> Path:
        out = self._step_dir(step)
        tmp = self.dir / f".tmp-model-{step}"
        if tmp.exists():
            shutil.rmtree(tmp)
        tmp.mkdir(parents=True)
        meta: Dict[str, str] = {}
        for name, el in self._elements.items():
            if hasattr(el, "state_dict"):
                (tmp / f"{name}.json").write_text(
                    json.dumps(el.state_dict(), cls=_NpEncoder))
                meta[name] = "json"
            elif _is_pytree_of_arrays(el):
                self._ckptr.save((tmp / name).absolute(), el)
                meta[name] = "pytree"
            else:
                (tmp / f"{name}.json").write_text(
                    json.dumps(el, cls=_NpEncoder))
                meta[name] = "json_value"
        (tmp / "META.json").write_text(json.dumps({"step": step,
                                                   "elements": meta}))
        if out.exists():
            shutil.rmtree(out)
        tmp.rename(out)  # atomic publish
        self._retain()
        return out

    def _retain(self) -> None:
        steps = self.saved_steps()
        for s in steps[:-self.keep_last] if self.keep_last else []:
            shutil.rmtree(self._step_dir(s), ignore_errors=True)

    def saved_steps(self) -> List[int]:
        steps = []
        for p in self.dir.glob("model-*"):
            try:
                steps.append(int(p.name.split("-", 1)[1]))
            except ValueError:
                continue
        return sorted(steps)

    def latest_step(self) -> Optional[int]:
        steps = self.saved_steps()
        return steps[-1] if steps else None

    def restore(self, step: Optional[int] = None) -> int:
        """Load all registered elements in place (pytrees are returned via
        `self[name] = restored`; stateful elements via load_state_dict)."""
        if step is None:
            step = self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {self.dir}")
        src = self._step_dir(step)
        meta = json.loads((src / "META.json").read_text())
        for name, kind in meta["elements"].items():
            if name not in self._elements:
                continue
            el = self._elements[name]
            if kind == "json":
                el.load_state_dict(
                    json.loads((src / f"{name}.json").read_text()))
            elif kind == "pytree":
                target = el if _is_pytree_of_arrays(el) else None
                restored = self._ckptr.restore((src / name).absolute(),
                                               item=target)
                self._elements[name] = restored
            else:
                self._elements[name] = json.loads(
                    (src / f"{name}.json").read_text())
        return step

    def tick(self, step: int) -> Optional[Path]:
        """Save if `step` hits the interval (saver.py:146-152)."""
        if self.save_interval and step > 0 and step % self.save_interval == 0:
            return self.save(step)
        return None
