"""The registries are the extension mechanism (SURVEY L2: the
reference's Register*Type calls).  These tests prove the contract:
swapping an INPUT_TYPES entry changes what build_visit_context
constructs, and a user-registered extra output is invoked by
write_outputs with the standard handler signature.
"""
import numpy as np

from imsim_tpu.config import registry
from imsim_tpu.config.runner import build_visit_context, write_outputs

TINY_CFG = {
    "opsim_meta": {"band": "r", "fieldRA": 30.0, "fieldDec": -10.0,
                   "mjd": 60674.2, "exptime": 30.0, "seed": 11,
                   "rawSeeing": 0.7},
    "input": {"atm_psf": {"screen_size": 102.4, "screen_scale": 0.8}},
}


def test_swap_input_type(monkeypatch):
    class MyVignetting:
        def __call__(self, r_mm):
            return np.ones_like(np.asarray(r_mm, float)) * 0.5

    seen = {}

    def my_handler(node, view):
        seen["node"] = node
        return MyVignetting()

    monkeypatch.setitem(registry.INPUT_TYPES, "vignetting", my_handler)
    cfg = dict(TINY_CFG)
    cfg["input"] = dict(TINY_CFG["input"],
                        vignetting={"marker": 123})
    ctx = build_visit_context(cfg)
    assert isinstance(ctx.vignetting, MyVignetting)
    assert seen["node"] == {"marker": 123}


def test_custom_extra_output(tmp_path, monkeypatch):
    calls = []

    def my_extra(ctx, result, node, det_name, det_num, outdir):
        calls.append((det_name, det_num, node))
        with open(f"{outdir}/extra_{det_name}.txt", "w") as f:
            f.write(f"{float(np.sum(result['eimage'])):.1f}\n")

    monkeypatch.setitem(registry.EXTRA_OUTPUT_TYPES, "pixel_sum",
                        my_extra)
    cfg = dict(TINY_CFG)
    cfg["output"] = {
        "dir": str(tmp_path),
        "readout": {"enabled": False},
        "truth": {"enabled": False},
        # key name != type name: dispatch is by the node's `type`
        "my_stats": {"type": "pixel_sum", "knob": 7},
    }
    ctx = build_visit_context(cfg)
    ccd = ctx.camera["R22_S11"]
    eimage = np.full((8, 8), 2.0, np.float32)
    from imsim_tpu.optics.wcs import TanSipWCS

    wcs = TanSipWCS([4.0, 4.0], np.eye(2) * 5.5e-5,
                    [30.0 * np.pi / 180, -10.0 * np.pi / 180])
    result = dict(det_name="R22_S11", det_num=94, eimage=eimage,
                  wcs=wcs, ccd=ccd, host=None, modes=None)
    write_outputs(ctx, result)
    assert calls and calls[0][0] == "R22_S11"
    assert calls[0][2]["knob"] == 7
    val = float(open(f"{tmp_path}/extra_R22_S11.txt").read())
    assert val == 128.0
    # the eimage itself was still written
    import os

    assert any(f.endswith(".fits") for f in os.listdir(tmp_path))
