"""rcu_tpu.tools — the scripts/ data-prep & utility scripts as a subpackage.

Mapped to ``rcu_tpu.tools`` by pyproject.toml's package-dir for the
``rcu-create-*``/``rcu-prepare-*``/``rcu-import-*``/``rcu-generate-configs``
console entry points. The bench/perf-attribution scripts in this directory
are development tools and have no console entry points.
"""
