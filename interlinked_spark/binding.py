"""Signature-aware dependency injection.

:func:`bind` is what lets a single keyword pool (workflow defaults, route
params, run kwargs, config) serve producer functions with heterogeneous
signatures: kwargs a function cannot accept are silently dropped unless it
declares ``**kwargs`` (parity:
``/root/reference/interlinked/workflow.py:282-315``).
"""

from __future__ import annotations

from functools import partial
from inspect import Parameter, signature
from typing import Any, Callable, Optional, Sequence


def bind(fn: Callable, args: Optional[Sequence] = None, kw: Optional[dict] = None) -> Callable:
    """Return ``fn`` partially applied with ``args`` and the subset of
    ``kw`` its signature accepts.

    * a kwarg not named in the signature is dropped, unless the function
      has a ``**kwargs`` catch-all;
    * a kwarg whose parameter is already covered positionally by ``args``
      is dropped (no duplicate-argument errors);
    * when nothing would be bound, ``fn`` is returned unchanged.
    """
    args = list(args or [])
    kw = kw or {}

    params = signature(fn).parameters
    accepts_any = any(p.kind == Parameter.VAR_KEYWORD for p in params.values())
    # Positional slots filled by `args`: required params, in declaration order.
    required_order = {
        p.name: idx
        for idx, p in enumerate(params.values())
        if p.default is Parameter.empty
    }

    selected: dict[str, Any] = {}
    for name, value in kw.items():
        if name not in params and not accepts_any:
            continue
        if name in required_order and required_order[name] < len(args):
            continue  # already supplied positionally
        selected[name] = value

    if not args and not selected:
        return fn
    return partial(fn, *args, **selected)
