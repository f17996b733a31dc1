"""Class registry + constructor-filtering factory — the DI backbone of the CLI
layer (same role as reference ``chemprop/utils/registry.py:7-46``, fresh
implementation)."""

from __future__ import annotations

import inspect
from typing import Any, Generic, Iterable, TypeVar

T = TypeVar("T")


class ClassRegistry(dict, Generic[T]):
    """A ``{alias: class}`` mapping populated via decorator.

    >>> Registry = ClassRegistry()
    >>> @Registry.register("mean")
    ... class MeanAgg: ...
    """

    def register(self, alias: str | Iterable[str] | None = None):
        def decorator(cls: type[T]) -> type[T]:
            if alias is None:
                keys = [cls.__name__.lower()]
            elif isinstance(alias, str):
                keys = [alias]
            else:
                keys = list(alias)
            cls.alias = keys[0]
            for k in keys:
                self[k.lower()] = cls
            return cls

        return decorator

    def __getitem__(self, key: str) -> type[T]:
        try:
            return super().__getitem__(key.lower())
        except KeyError:
            raise KeyError(
                f"{key!r} is not registered; available: {sorted(self.keys())}"
            ) from None


class Factory:
    """Build ``cls(**kwargs)`` silently dropping kwargs the constructor does
    not accept (used to share one big CLI namespace across many classes)."""

    @staticmethod
    def build(cls: type[T], *args: Any, **kwargs: Any) -> T:
        sig = inspect.signature(cls)
        if any(p.kind == p.VAR_KEYWORD for p in sig.parameters.values()):
            return cls(*args, **kwargs)
        accepted = {k: v for k, v in kwargs.items() if k in sig.parameters}
        return cls(*args, **accepted)
