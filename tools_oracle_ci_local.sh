#!/bin/bash
# Local reproduction of the `oracle-parity` public-CI job (VERDICT r4 item 8).
#
# The real job (.github/workflows/ci.yml) pip-installs matchering==2.0.6 from
# PyPI (which brings real soundfile/resampy/statsmodels) and runs
# tests/test_pipeline_parity.py with no /root/reference mount.  This box has
# zero network egress, so the closest faithful reproduction is:
#
#   * a venv with --system-site-packages standing in for the job's
#     `pip install jax[cpu] scipy numpy pytest`;
#   * the reference tree (which IS the published 2.0.6 source) pip-installed
#     as the `matchering` package with --no-deps;
#   * shim distributions for its three unavailable deps, installed as real
#     venv packages: soundfile (format table + guarded I/O), resampy
#     (guarded — the parity suite never resamples), and statsmodels whose
#     `nonparametric.lowess` is the repo's direct-loop Cleveland LOWESS
#     oracle (tests/oracle_lowess.py).  In the real job these are the real
#     libraries; LOWESS is the only semantic stand-in, and
#     tests/test_pipeline_parity.py::TestLowessOracle pins our kernel
#     against that same oracle independently.
#   * MATCHERING_TPU_ORACLE=published forces conftest's published-package
#     branch (no dev-box stubs), exactly the import path CI exercises.
#
# Results land in ORACLE_CI_LOCAL_r05.json.
set -euo pipefail
cd /root/repo
PY=/opt/venv/bin/python
VENV=/tmp/oracle_venv
BUILD=/tmp/oracle_ref_build

rm -rf "$VENV" "$BUILD"
"$PY" -m venv "$VENV"
cp -r /root/reference "$BUILD"
chmod -R u+w "$BUILD"

SITE=$("$VENV/bin/python" -c "import sysconfig; print(sysconfig.get_paths()['purelib'])")

# /opt/venv is itself a venv, so venv-from-venv chains to the package-less
# base interpreter; expose /opt/venv's site-packages (jax/scipy/numpy/
# pytest/setuptools — the job's `pip install jax[cpu] scipy numpy pytest`)
# via a .pth.  The venv's own site-packages precedes it, so the shims and
# the installed `matchering` still win.
"$PY" -c "import sysconfig; print(sysconfig.get_paths()['purelib'])" > "$SITE/base_env.pth"

"$VENV/bin/pip" install --quiet --no-deps --no-build-isolation --no-index "$BUILD"

cat > "$SITE/soundfile.py" <<'EOF'
"""Shim for the oracle-parity local repro: the parity suite drives the
reference's stages/limiter directly and never touches disk I/O."""
__version__ = "0.0-shim"

def check_format(*_a, **_k):
    return True

def read(*_a, **_k):
    raise RuntimeError("soundfile shim: parity tests must not read files")

def write(*_a, **_k):
    raise RuntimeError("soundfile shim: parity tests must not write files")
EOF

cat > "$SITE/resampy.py" <<'EOF'
def resample(*_a, **_k):
    raise RuntimeError("resampy shim: parity tests must not resample")
EOF

mkdir -p "$SITE/statsmodels/nonparametric"
cp tests/oracle_lowess.py "$SITE/statsmodels/nonparametric/_oracle_lowess.py"
cat > "$SITE/statsmodels/__init__.py" <<'EOF'
EOF
cat > "$SITE/statsmodels/nonparametric/__init__.py" <<'EOF'
from ._oracle_lowess import lowess
from . import _oracle_lowess as smoothers_lowess
EOF
cat > "$SITE/statsmodels/nonparametric/smoothers_lowess.py" <<'EOF'
from ._oracle_lowess import lowess
EOF
cat > "$SITE/statsmodels/api.py" <<'EOF'
from statsmodels import nonparametric
EOF

"$VENV/bin/python" -c "import matchering; print('oracle import ok:', matchering.__file__)"

# the CI job's build step
"$VENV/bin/python" -m matchering_tpu.io.native.build

LOG=/tmp/oracle_ci_local.log
set +e
MATCHERING_TPU_ORACLE=published "$VENV/bin/python" -m pytest tests/test_pipeline_parity.py -q 2>&1 | tee "$LOG"
RC=${PIPESTATUS[0]}
set -e

"$PY" - "$RC" "$LOG" <<'EOF'
import json, sys
rc, log = int(sys.argv[1]), open(sys.argv[2]).read().strip().splitlines()
doc = {
    "what": "local reproduction of the oracle-parity CI job (VERDICT r4 "
            "item 8): matchering installed as a package (published 2.0.6 "
            "source), conftest forced onto its published-oracle branch, "
            "tests/test_pipeline_parity.py run end to end",
    "caveat": "zero-egress box: deps stand in via shim distributions; "
              "statsmodels.lowess = tests/oracle_lowess.py (the one "
              "semantic stand-in vs real CI)",
    "steps": [
        "python -m venv /tmp/oracle_venv (+ .pth exposing the base jax/scipy/numpy/pytest env)",
        "pip install --no-deps --no-index <matchering 2.0.6 source>",
        "install soundfile/resampy/statsmodels shim packages",
        "python -m matchering_tpu.io.native.build",
        "MATCHERING_TPU_ORACLE=published pytest tests/test_pipeline_parity.py -q",
    ],
    "exit_code": rc,
    "tail": log[-3:],
}
with open("ORACLE_CI_LOCAL_r05.json", "w") as f:
    json.dump(doc, f, indent=1)
print(json.dumps(doc, indent=1))
EOF
exit "$RC"
