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


def setup_compile_cache(cache_dir: str = "~/.jax_cache") -> bool:
    """Enable the persistent XLA compile cache — TPU backends only.

    Remote TPU compiles through the dev tunnel cost 30s-3min each, so the
    cache is essential there (CLAUDE.md). On CPU it is actively DANGEROUS:
    XLA:CPU AOT executables embed the compiling machine's feature set, and
    loading an entry whose features mismatch the running host aborts the
    process (observed SIGABRT via cpu_aot_loader "machine features"
    mismatch) — and CPU compiles are cheap anyway. Returns True when
    enabled."""
    import os

    import jax

    if jax.default_backend() == "cpu":
        return False
    jax.config.update(
        "jax_compilation_cache_dir", os.path.expanduser(cache_dir)
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return True
