"""Packaging surface: pyproject console-script targets must resolve.

The reference ships only an environment.yml (no installable package);
shipping a pip-installable distribution with `mggan-train` / `mggan-evaluate`
entry points is part of the standalone-framework surface (README usage)."""

import importlib
import tomllib
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def test_console_scripts_resolve():
    meta = tomllib.loads((ROOT / "pyproject.toml").read_text())
    scripts = meta["project"]["scripts"]
    assert set(scripts) == {
        "mggan-train", "mggan-evaluate", "mggan-sweep",
        "mggan-convert", "mggan-export", "mggan-serve",
    }
    for target in scripts.values():
        mod_name, func_name = target.split(":")
        fn = getattr(importlib.import_module(mod_name), func_name)
        assert callable(fn)


def test_native_source_ships_as_package_data():
    meta = tomllib.loads((ROOT / "pyproject.toml").read_text())
    patterns = meta["tool"]["setuptools"]["package-data"]["mggan_tpu.native"]
    src = ROOT / "mggan_tpu" / "native" / "src"
    for pat in patterns:
        assert list(src.parent.glob(pat)), pat
