"""Sphinx configuration for pydrobert_tpu."""

import os
import sys

sys.path.insert(0, os.path.abspath("../.."))

project = "pydrobert-tpu"
author = "pydrobert-tpu contributors"
copyright = "2026, pydrobert-tpu contributors"

extensions = [
    "sphinx.ext.autodoc",
    "sphinx.ext.autosummary",
    "sphinx.ext.intersphinx",
    "sphinx.ext.napoleon",
    "sphinx.ext.viewcode",
]
autosummary_generate = True
autodoc_member_order = "bysource"
autodoc_typehints = "description"

intersphinx_mapping = {
    "python": ("https://docs.python.org/3", None),
    "numpy": ("https://numpy.org/doc/stable", None),
    "jax": ("https://docs.jax.dev/en/latest", None),
}

templates_path = []
exclude_patterns = []
html_theme = "sphinx_rtd_theme"
