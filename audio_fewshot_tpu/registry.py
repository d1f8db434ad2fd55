"""Name → factory registries.

Replaces the reference's reflection factory ``get_instance(module, name, cfg)``
(reference libfewshot_core/utils/utils.py:20-35) with explicit registries, so
the YAML surface (``classifier.name`` / ``backbone.name``) stays identical
while construction is static and typo-checked.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional


class Registry:
    def __init__(self, kind: str):
        self.kind = kind
        self._factories: Dict[str, Callable[..., Any]] = {}

    def register(self, name: Optional[str] = None):
        def deco(fn):
            key = name or fn.__name__
            if key in self._factories:
                raise ValueError(
                    f"duplicate {self.kind} registration {key!r} — a config "
                    "naming it would silently build the wrong component"
                )
            self._factories[key] = fn
            return fn

        return deco

    def register_alias(self, name: str, target: str) -> None:
        self._factories[name] = self._factories[target]

    def __contains__(self, name: str) -> bool:
        return name in self._factories

    def names(self):
        return sorted(self._factories)

    def get(self, name: str) -> Callable[..., Any]:
        """The registered factory itself (for pre-build attribute checks)."""
        if name not in self._factories:
            raise KeyError(
                f"unknown {self.kind} {name!r}; registered: {self.names()}"
            )
        return self._factories[name]

    def build(self, name: str, **kwargs) -> Any:
        if name not in self._factories:
            raise KeyError(
                f"unknown {self.kind} {name!r}; registered: {self.names()}"
            )
        return self._factories[name](**kwargs)


BACKBONES = Registry("backbone")
CLASSIFIERS = Registry("classifier")


def build_from_config(registry: Registry, section: Dict[str, Any], **extra) -> Any:
    """Build from a ``{name: ..., kwargs: ...}`` config section, merging
    ``extra`` kwargs (mirrors reference get_instance kwarg merge)."""
    kwargs = dict(section.get("kwargs") or {})
    kwargs.update(extra)
    return registry.build(section["name"], **kwargs)
