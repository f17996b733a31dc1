"""Core utilities (case-insensitive enums, parallel execution).

Same capabilities as reference ``chemprop/utils/utils.py`` (minus ``make_mol``,
which lives in :mod:`chemprop_tpu.chem` on top of the in-repo parser)."""

from __future__ import annotations

import os
from enum import StrEnum
from typing import Callable, Iterable, Sequence, TypeVar

T = TypeVar("T")
U = TypeVar("U")


class EnumMapping(StrEnum):
    """A StrEnum with case-insensitive lookup via ``get``."""

    @classmethod
    def get(cls, name: "str | EnumMapping") -> "EnumMapping":
        if isinstance(name, cls):
            return name
        try:
            return cls[str(name).upper().replace("-", "_")]
        except KeyError:
            raise KeyError(
                f"Unsupported {cls.__name__} member! got: {name!r}; "
                f"expected one of: {', '.join(m.name for m in cls)}"
            ) from None

    @classmethod
    def keys(cls) -> list[str]:
        return [m.name.lower() for m in cls]

    @classmethod
    def values(cls) -> list[str]:
        return [m.value for m in cls]


def parallel_execute(
    fn: Callable[..., U],
    items: Sequence,
    n_workers: int = 0,
    chunksize: int | None = None,
) -> list[U]:
    """Map ``fn`` over ``items``, optionally fanning out across processes.

    ``n_workers <= 1`` runs serially (the common, overhead-free path);
    otherwise a multiprocessing pool is used for CPU-bound host featurization
    (same role as reference ``chemprop/utils/utils.py:112-155``).
    """
    if n_workers is None or n_workers <= 1:
        return [fn(item) for item in items]
    import multiprocessing as mp

    n_workers = min(n_workers, os.cpu_count() or 1)
    if chunksize is None:
        chunksize = max(1, len(items) // (n_workers * 4))
    with mp.get_context("fork").Pool(n_workers) as pool:
        return list(pool.map(fn, items, chunksize=chunksize))


def batched(iterable: Iterable[T], n: int) -> Iterable[list[T]]:
    batch: list[T] = []
    for item in iterable:
        batch.append(item)
        if len(batch) == n:
            yield batch
            batch = []
    if batch:
        yield batch


def create_and_call_object(
    cls, call_args: tuple = (), call_kwargs: dict | None = None,
    init_args: tuple = (), init_kwargs: dict | None = None,
):
    """Instantiate ``cls`` and immediately call the instance (reference
    ``utils/utils.py:93-109``; used for parallel calls to callable objects)."""
    return cls(*init_args, **(init_kwargs or {}))(*call_args, **(call_kwargs or {}))


def pretty_shape(shape) -> str:
    """'10 x 4'-style shape string (reference ``utils/utils.py:158-170``)."""
    return " x ".join(map(str, shape))
