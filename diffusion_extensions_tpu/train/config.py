"""Config plumbing: one flat dict (argparse namespace) feeds many
constructors by signature inspection — the reference's ``init_from_dict``
pattern (``util.py:440-460``) kept verbatim so experiment drivers retain the
same knob names (batch/lr/dim/heads/layers/--so3/--se3)."""
from __future__ import annotations

import dataclasses
import inspect
from typing import Any, Mapping

__all__ = ["init_from_dict", "dataclass_from_dict"]


def init_from_dict(argdict: Mapping[str, Any], *classes):
    """Instantiate each class from the subset of ``argdict`` matching its
    signature; missing/extra keys ignored (reference: ``util.py:440-460``)."""
    objs = []
    for cls in classes:
        sig = inspect.signature(cls)
        names = [
            k
            for k, v in sig.parameters.items()
            if v.kind
            in (
                inspect.Parameter.POSITIONAL_OR_KEYWORD,
                inspect.Parameter.KEYWORD_ONLY,
            )
        ]
        kwargs = {k: v for k, v in argdict.items() if k in names}
        objs.append(cls(**kwargs))
    return objs


def dataclass_from_dict(cls, argdict: Mapping[str, Any]):
    """Fill a dataclass from a flat dict, ignoring unknown keys."""
    names = {f.name for f in dataclasses.fields(cls)}
    return cls(**{k: v for k, v in argdict.items() if k in names})
