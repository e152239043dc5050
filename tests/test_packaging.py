"""Packaging contract: pyproject console scripts resolve to real callables
and the repo-root launcher shims re-export the same entry points (the
reference is run as ``python train_*.py``; the package installs the same
surface as ``hpvaegan-*`` scripts)."""
import importlib
import os
import tomllib

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def pyproject():
    with open(os.path.join(ROOT, "pyproject.toml"), "rb") as f:
        return tomllib.load(f)


def test_console_scripts_resolve(pyproject):
    scripts = pyproject["project"]["scripts"]
    assert set(scripts) == {
        "hpvaegan-train-image", "hpvaegan-train-video",
        "hpvaegan-train-video-baselines", "hpvaegan-generate",
        "hpvaegan-serve"}
    for target in scripts.values():
        mod_name, func_name = target.split(":")
        mod = importlib.import_module(mod_name)
        assert callable(getattr(mod, func_name))


@pytest.mark.parametrize("shim, cli_mod", [
    ("train_image", "hpvaegan_tpu.cli.train_image"),
    ("train_video", "hpvaegan_tpu.cli.train_video"),
    ("train_video_baselines", "hpvaegan_tpu.cli.train_video_baselines"),
    ("generate", "hpvaegan_tpu.cli.generate"),
    ("serve", "hpvaegan_tpu.cli.serve"),
])
def test_root_shims_reexport_main(shim, cli_mod):
    shim_main = importlib.import_module(shim).main
    assert shim_main is importlib.import_module(cli_mod).main


def test_package_discovery_includes_cli(pyproject):
    include = pyproject["tool"]["setuptools"]["packages"]["find"]["include"]
    assert any(pat.startswith("hpvaegan_tpu") for pat in include)
    assert os.path.isfile(
        os.path.join(ROOT, "hpvaegan_tpu", "cli", "__init__.py"))
