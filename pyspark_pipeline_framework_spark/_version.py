"""Single source of truth for the package version (mirrors the
reference's ``src/pyspark_pipeline_framework/_version.py:1`` release
hygiene). pyproject.toml reads it dynamically via
``[tool.setuptools.dynamic]``; see CHANGELOG.md for release notes."""

__version__ = "0.14.0"
