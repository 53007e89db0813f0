"""Legacy-install shim: environments with setuptools<66 and no `wheel`
package cannot build PEP 660 editable wheels from pyproject.toml alone
(pip errors with `invalid command 'bdist_wheel'`); there,
`python setup.py develop` installs the package + console entry point
directly. Modern environments should just `pip install -e .` — all
metadata lives in pyproject.toml."""

from setuptools import setup

setup()
