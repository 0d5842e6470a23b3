"""Process-wide provider registry — the ``parser_context`` analogue
(/root/reference/doc_parser/context.py wires ``image_provider`` into every
parse; services/dependencies.py binds the S3/vision implementations).

Spark twist: a plan that runs on executors cannot carry a live provider
object reliably, so providers are addressed by NAME — the name string
serializes into the python workers and each worker process constructs its
instance lazily on first use (providers need not be picklable).

Register custom backends at import time on the executors (e.g. in a
``--py-files`` module) via ``register_image_provider``.
"""

from __future__ import annotations

import importlib
from typing import Optional

#: name -> (module, class); instantiated with no arguments
IMAGE_PROVIDERS = {
    "stub": ("bella_domify_spark.providers", "StubImageProvider"),
}

_instances: dict = {}


def register_image_provider(name: str, module: str, cls: str) -> None:
    """Make ``name`` resolvable on this process (call on executors too —
    a module shipped via --py-files that registers at import time)."""
    IMAGE_PROVIDERS[name] = (module, cls)
    _instances.pop(name, None)


def image_provider(name: Optional[str]):
    """Resolve a provider name to a (cached, per-process) instance.
    ``None`` → no provider (images stay bare placeholders)."""
    if name is None:
        return None
    if name not in _instances:
        try:
            module, cls = IMAGE_PROVIDERS[name]
        except KeyError:
            raise ValueError(
                f"unknown image provider {name!r}; known: "
                f"{sorted(IMAGE_PROVIDERS)} — register_image_provider() "
                f"first") from None
        _instances[name] = getattr(importlib.import_module(module), cls)()
    return _instances[name]
