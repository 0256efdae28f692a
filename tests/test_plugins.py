"""Plugin + env-var config tier (reference: vllm/plugins/, vllm/envs.py)."""

import types

import pytest


def test_env_registry(monkeypatch):
    from qspec_tpu import envs

    assert envs.QSPEC_PORT == 8000
    monkeypatch.setenv("QSPEC_PORT", "9100")
    assert envs.QSPEC_PORT == 9100
    monkeypatch.setenv("QSPEC_ENABLE_PREFIX_CACHING", "false")
    assert envs.QSPEC_ENABLE_PREFIX_CACHING is False
    with pytest.raises(AttributeError):
        envs.NOT_A_KNOB


def _fake_eps(monkeypatch, eps):
    import importlib.metadata as md

    class EP:
        def __init__(self, name, fn):
            self.name, self._fn, self.value = name, fn, f"fake:{name}"

        def load(self):
            return self._fn

    real = md.entry_points

    def fake(group=None, **kw):
        if group == "qspec_tpu.general_plugins":
            return [EP(n, f) for n, f in eps.items()]
        return real(group=group, **kw) if group else real(**kw)

    monkeypatch.setattr(md, "entry_points", fake)


def test_plugin_loading_and_allowlist(monkeypatch):
    from qspec_tpu import plugins

    calls = []
    _fake_eps(monkeypatch, {"good": lambda: calls.append("good"),
                            "other": lambda: calls.append("other")})

    loaded = plugins.load_plugins_by_group("qspec_tpu.general_plugins")
    assert set(loaded) == {"good", "other"}

    monkeypatch.setenv("QSPEC_PLUGINS", "good")
    loaded = plugins.load_plugins_by_group("qspec_tpu.general_plugins")
    assert set(loaded) == {"good"}


def test_plugin_registers_model_arch(monkeypatch):
    from qspec_tpu import plugins
    from qspec_tpu.models import registry

    def register():
        from qspec_tpu.config import ModelConfig
        from qspec_tpu.models.registry import register_model

        @register_model("TestPluginForCausalLM")
        def _build(hf):
            return ModelConfig.tiny()

    _fake_eps(monkeypatch, {"archplug": register})
    monkeypatch.setattr(plugins, "_plugins_loaded", False)
    plugins.load_general_plugins()
    assert "TestPluginForCausalLM" in registry.supported_architectures()
    cfg = registry.resolve({"architectures": ["TestPluginForCausalLM"]})
    assert cfg.hidden_size > 0
    registry._REGISTRY.pop("TestPluginForCausalLM")


def test_plugin_load_idempotent(monkeypatch):
    from qspec_tpu import plugins

    calls = []
    _fake_eps(monkeypatch, {"once": lambda: calls.append(1)})
    monkeypatch.setattr(plugins, "_plugins_loaded", False)
    plugins.load_general_plugins()
    plugins.load_general_plugins()
    assert calls == [1]
