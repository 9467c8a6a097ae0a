"""rcu_tpu.cli — the bin/ entry scripts as an installable subpackage.

The scripts live in the repo-root ``bin/`` directory (the reference's layout,
runnable as ``python bin/<name>.py`` from a bare checkout) and are mapped to
``rcu_tpu.cli`` by pyproject.toml's package-dir so the ``rcu-*`` console
entry points resolve after ``pip install -e .``.
"""
