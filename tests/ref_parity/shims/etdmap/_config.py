"""``etdmap._config`` shim: the ``Options`` container.

Reconstructed from usage at reference _config.py:3-58 — the constructor
takes a dict of ``Option`` namedtuples (key/default_value/doc/validator/
callback) and the instance supports plain attribute get (default until
set) and set (reference tests/conftest.py:23-27 assigns paths directly).
"""

from __future__ import annotations

from collections import namedtuple

Option = namedtuple("Option", "key default_value doc validator callback")


class Options:
    def __init__(self, option_defs: dict):
        object.__setattr__(self, "_defs", dict(option_defs))
        object.__setattr__(self, "_values", {})

    def __getattr__(self, name: str):
        # only called when normal lookup fails -> _defs/_values resolved above
        values = object.__getattribute__(self, "_values")
        defs = object.__getattribute__(self, "_defs")
        if name in values:
            return values[name]
        if name in defs:
            return defs[name].default_value
        raise AttributeError(f"no such option: {name}")

    def __setattr__(self, name: str, value) -> None:
        defs = object.__getattribute__(self, "_defs")
        if name not in defs:
            raise AttributeError(f"no such option: {name}")
        opt = defs[name]
        if opt.validator is not None:
            opt.validator(value)
        object.__getattribute__(self, "_values")[name] = value
        if opt.callback is not None:
            opt.callback(value)
