"""String-keyed class/function registries.

Capability parity with /root/reference/flowdec/util/registry.py:11 — used for
SDEs, predictors, correctors and solvers so configs can reference them by name.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Iterable


class Registry:
    def __init__(self, managed_thing: str):
        self.managed_thing = managed_thing
        self._registry: Dict[str, Any] = {}

    def register(self, name: str) -> Callable:
        def decorator(obj):
            if name in self._registry:
                raise ValueError(
                    f"{self.managed_thing} registry already has an entry {name!r}"
                )
            self._registry[name] = obj
            return obj

        return decorator

    def get_by_name(self, name: str):
        try:
            return self._registry[name]
        except KeyError as e:
            raise ValueError(
                f"Unknown {self.managed_thing} {name!r}; known: {sorted(self._registry)}"
            ) from e

    def get_all_names(self) -> Iterable[str]:
        return sorted(self._registry)

    def __contains__(self, name: str) -> bool:
        return name in self._registry
