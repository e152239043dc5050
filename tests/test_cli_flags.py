"""Flag-for-flag CLI parity with the reference entry points.

Extracts every ``add_argument('--flag', ...)`` from the reference trainers
(train_image.py:276-334, train_video.py:262-321,
train_video_baselines.py:225-264) and asserts our parsers expose the same
flag names with the same defaults.  TPU-native extension flags are allowed
on top (whitelisted below).
"""
import re

import pytest

from hpvaegan_tpu.core.config import build_parser

REFERENCE = "/root/reference"

# flags we add on top of the reference CLI (TPU-native extensions)
EXTRA_ALLOWED = {
    "--bf16", "--fast-grads", "--hoist-prefix", "--fused-forwards",
    "--mesh-shape", "--spmd",
    "--run-dir", "--profile-dir", "--scan-steps", "--distributed", "--help",
    "--remat", "--remat-blocks", "--gp-chunked",
    "--wpack", "--pconv", "--pconv-all", "--pfuse", "--host-loader",
    "--compile-ahead", "--decode-ahead", "--watchdog", "--save-interval",
}

# shared-Config flags our baselines parser accepts that the reference's
# baselines parser rejects (benign superset: same defaults as the other
# trainers, read by shared model/trainer code paths)
KIND_EXTRA_ALLOWED = {
    "video_baselines": {
        "--const-amp", "--enc-blocks", "--grad-clip", "--kl-weight",
        "--latent-dim", "--rec-weight", "--train-all", "--vae-levels",
    },
}

KINDS = [
    ("image", "train_image.py"),
    ("video", "train_video.py"),
    ("video_baselines", "train_video_baselines.py"),
]


def reference_flags(fname):
    with open(f"{REFERENCE}/{fname}") as f:
        src = f.read()
    flags = {}
    for m in re.finditer(r"add_argument\('(--[\w-]+)'(.*?)\)\n", src, re.S):
        flag, rest = m.group(1), m.group(2)
        dm = re.search(r"default=([^,\)]+)", rest)
        default = None
        if dm:
            try:
                default = eval(dm.group(1).strip(), {}, {})  # literals only
            except Exception:
                default = "<unevaluable>"
        flags[flag] = default
    # set_defaults(hflip=False) in every reference trainer
    flags.setdefault("--hflip", False)
    return flags


def our_flags(kind):
    parser = build_parser(kind)
    out = {}
    for action in parser._actions:
        for s in action.option_strings:
            if s.startswith("--"):
                out[s] = action.default
    return out


@pytest.mark.parametrize("kind,fname", KINDS)
def test_every_reference_flag_exists(kind, fname):
    ref = reference_flags(fname)
    ours = our_flags(kind)
    missing = sorted(set(ref) - set(ours))
    assert not missing, f"{fname}: missing flags {missing}"


@pytest.mark.parametrize("kind,fname", KINDS)
def test_defaults_match_reference(kind, fname):
    ref = reference_flags(fname)
    ours = our_flags(kind)
    mismatched = {}
    for flag, rd in ref.items():
        if rd == "<unevaluable>" or rd is None:
            continue
        od = ours[flag]
        if isinstance(rd, bool) or isinstance(od, bool):
            same = bool(rd) == bool(od)
        elif isinstance(rd, (int, float)) and isinstance(od, (int, float)):
            same = float(rd) == float(od)
        else:
            same = rd == od
        if not same:
            mismatched[flag] = (rd, od)
    assert not mismatched, f"{fname}: default mismatches {mismatched}"


@pytest.mark.parametrize("kind,fname", KINDS)
def test_extensions_are_whitelisted(kind, fname):
    """Every flag we add beyond the reference CLI is a declared extension."""
    ref = reference_flags(fname)
    ours = our_flags(kind)
    undeclared = sorted(set(ours) - set(ref) - EXTRA_ALLOWED
                        - KIND_EXTRA_ALLOWED.get(kind, set()))
    assert not undeclared, f"{kind}: undeclared extra flags {undeclared}"
