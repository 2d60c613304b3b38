"""The shipped example configs must always parse through the
interpreter with their template inheritance and eval-variables intact
(the reference's CI smoke-runs its examples/,
.github/workflows/ci.yml:128-133 — the parse/structure layer of that
gate; full renders are covered by the slow-tier pipeline tests)."""
import glob
import os

import pytest

from imsim_tpu.config.interpreter import load_config

EXAMPLES = sorted(glob.glob(
    os.path.join(os.path.dirname(__file__), "..", "examples", "*.yaml")))


@pytest.mark.parametrize("path", EXAMPLES,
                         ids=[os.path.basename(p) for p in EXAMPLES])
def test_example_parses(path):
    cfg = load_config(path)
    assert isinstance(cfg, dict)
    # every example must wire at least an image and an output section
    assert "image" in cfg
    assert "output" in cfg
    # dotted-key overrides work on every example (the CLI surface)
    cfg2 = load_config(path, overrides=["output.dir=/tmp/x",
                                        "image.nobjects=3"])
    assert cfg2["output"]["dir"] == "/tmp/x"
    assert int(cfg2["image"]["nobjects"]) == 3


def test_examples_exist():
    assert len(EXAMPLES) >= 4
