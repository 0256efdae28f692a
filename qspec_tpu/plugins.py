"""Plugin loading via package entry points (reference: vllm/plugins/).

Third-party packages extend the engine by declaring entry points:

    [project.entry-points."qspec_tpu.general_plugins"]
    my_plugin = "my_pkg.plugin:register"

Each entry point is a zero-arg callable run once per process at engine
construction. The canonical use is registering model architectures:

    def register():
        from qspec_tpu.models.registry import register_model
        register_model("MyArchForCausalLM", my_cfg_builder)

``QSPEC_PLUGINS`` (comma-separated names) restricts which load; unset loads
all discovered plugins. Loading is idempotent per process.
"""

from __future__ import annotations

import logging
from typing import Callable, Dict

logger = logging.getLogger(__name__)

_plugins_loaded = False


def load_plugins_by_group(group: str) -> Dict[str, Callable]:
    from importlib.metadata import entry_points

    from qspec_tpu import envs

    allowed = envs.QSPEC_PLUGINS
    allowed = None if allowed is None else {
        n.strip() for n in allowed.split(",") if n.strip()}

    plugins: Dict[str, Callable] = {}
    for ep in entry_points(group=group):
        if allowed is not None and ep.name not in allowed:
            logger.info("plugin %s skipped (QSPEC_PLUGINS)", ep.name)
            continue
        try:
            plugins[ep.name] = ep.load()
            logger.info("plugin %s loaded from %s", ep.name, ep.value)
        except Exception:
            logger.exception("failed to load plugin %s", ep.name)
    return plugins


def load_general_plugins() -> None:
    """Run all qspec_tpu.general_plugins entry points once per process."""
    global _plugins_loaded
    if _plugins_loaded:
        return
    _plugins_loaded = True
    for name, fn in load_plugins_by_group("qspec_tpu.general_plugins").items():
        try:
            fn()
        except Exception:
            logger.exception("plugin %s raised during registration", name)
