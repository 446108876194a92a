"""Config/args helpers (/root/reference/utils.py:17-24 equivalents)."""
from __future__ import annotations

from argparse import Namespace
from typing import Any, Dict, Union


def update_args(old: Namespace, new: Union[Namespace, Dict[str, Any]]) -> Namespace:
    """Merge resumed checkpoint args over current CLI args
    (/root/reference/utils.py:17-21): checkpoint values win."""
    old_dict = dict(vars(old))
    new_dict = dict(new) if isinstance(new, dict) else dict(vars(new))
    old_dict.update(new_dict)
    return Namespace(**old_dict)


def remove_self(variables: Dict[str, Any]) -> Dict[str, Any]:
    """locals() -> kwargs bridge (/root/reference/utils.py:23-24); retained
    for API compatibility although the rebuild passes explicit contexts."""
    return {k: v for k, v in variables.items() if k != "self"}
