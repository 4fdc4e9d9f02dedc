"""Legacy-path shim: all metadata lives in pyproject.toml. This file
exists so ``pip install -e . --no-use-pep517`` works on environments
whose setuptools predates native PEP 660 editable wheels (the PEP 517
path needs the ``wheel`` package, which minimal containers lack)."""

from setuptools import setup

setup()
