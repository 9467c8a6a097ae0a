"""Packaging contract (pyproject.toml; reference requirements.txt:1-11).

Pins the installable surface without requiring an installed package:
every console entry point declared in pyproject.toml must resolve to an
actual script file (bin/ -> rcu_tpu.cli, scripts/ -> rcu_tpu.tools) that
defines the referenced callable, and every bin/ CLI must expose the
``cli()`` + ``__main__`` script-mode contract. ``pip install -e .`` +
``rcu-eval-direct ...`` is exercised for real in this image (the package
is installed editable); the structural checks here keep the mapping from
rotting in checkouts where it is not.
"""
import ast
import glob
import os
import tomllib

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def pyproject():
    with open(os.path.join(REPO_ROOT, "pyproject.toml"), "rb") as fp:
        return tomllib.load(fp)


PKG_DIRS = {"rcu_tpu.cli": "bin", "rcu_tpu.tools": "scripts"}


class TestEntryPoints:
    def test_every_console_script_resolves(self, pyproject):
        scripts = pyproject["project"]["scripts"]
        n_bin = len([p for p in glob.glob(os.path.join(REPO_ROOT, "bin", "*.py"))
                     if os.path.basename(p) not in ("__init__.py", "_cli.py")])
        assert len(scripts) >= n_bin + 6  # every bin CLI + 6 data-prep tools
        for name, target in scripts.items():
            module, func = target.split(":")
            pkg, leaf = module.rsplit(".", 1)
            assert pkg in PKG_DIRS, (name, target)
            path = os.path.join(REPO_ROOT, PKG_DIRS[pkg], f"{leaf}.py")
            assert os.path.isfile(path), (name, path)
            tree = ast.parse(open(path).read())
            funcs = {n.name for n in ast.walk(tree)
                     if isinstance(n, ast.FunctionDef)}
            assert func in funcs, f"{name}: {path} has no {func}()"

    def test_package_dir_mapping_matches_layout(self, pyproject):
        setuptools = pyproject["tool"]["setuptools"]
        mapping = setuptools["package-dir"]
        assert mapping["rcu_tpu.cli"] == "bin"
        assert mapping["rcu_tpu.tools"] == "scripts"
        for pkg in setuptools["packages"]:
            d = mapping.get(pkg, pkg.replace(".", "/"))
            assert os.path.isfile(os.path.join(REPO_ROOT, d, "__init__.py")), pkg

    def test_reference_named_clis_all_have_entry_points(self, pyproject):
        """The 18 reference bin-dl scripts (SURVEY §2.3) each map to a
        console entry point."""
        targets = set(pyproject["project"]["scripts"].values())
        for path in glob.glob(os.path.join(REPO_ROOT, "bin",
                                           "*_t*_*.py")):
            leaf = os.path.splitext(os.path.basename(path))[0]
            if leaf.startswith(("brats_", "isic_")):
                assert f"rcu_tpu.cli.{leaf}:cli" in targets, leaf

    def test_bin_scripts_keep_script_mode(self):
        """Every bin/ CLI stays runnable as `python bin/<name>.py` from a
        bare checkout: a __main__ guard plus either the _cli fallback
        import or a conditional repo-root bootstrap."""
        for path in sorted(glob.glob(os.path.join(REPO_ROOT, "bin", "*.py"))):
            if os.path.basename(path) in ("__init__.py", "_cli.py"):
                continue
            src = open(path).read()
            assert 'if __name__ == "__main__":' in src, path
            assert "import _cli" in src or "sys.path.insert" in src, path

    def test_dependencies_are_importable(self, pyproject):
        import importlib
        mod_names = {"PyYAML": "yaml", "pillow": "PIL",
                     "scikit-learn": "sklearn"}
        for dep in pyproject["project"]["dependencies"]:
            name = dep.split(">=")[0].strip()
            importlib.import_module(mod_names.get(name, name))
