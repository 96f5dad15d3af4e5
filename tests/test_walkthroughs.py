"""Execute the narrative walkthroughs in docs/walkthroughs/ (the
counterparts of the reference's four documentation notebooks,
/root/reference/doc/*.ipynb — every claim in them is an assertion)."""

import importlib.util
import pathlib

import pytest

pytestmark = pytest.mark.slow

_DOCS = pathlib.Path(__file__).resolve().parent.parent / "docs" / "walkthroughs"
_FILES = sorted(_DOCS.glob("*.py"))


def _load(path):
    spec = importlib.util.spec_from_file_location(path.stem, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_walkthroughs_present():
    assert len(_FILES) >= 4  # one per reference notebook


@pytest.mark.parametrize("path", _FILES, ids=lambda p: p.stem)
def test_walkthrough_runs(path):
    mod = _load(path)
    assert mod.main() is True
