"""Make the repo root importable when a script runs as `python scripts/x.py`.

Import this FIRST in every script under scripts/ (before gof_tpu imports):

    import _path  # noqa: F401  (repo-root sys.path bootstrap)

(Direct invocation puts scripts/ itself on sys.path[0], which is what makes
`import _path` resolve.)
"""
import os
import sys

_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _root not in sys.path:
    sys.path.insert(0, _root)
# scripts/ itself, so `import _path` resolves from either invocation style
_here = os.path.dirname(os.path.abspath(__file__))
if _here not in sys.path:
    sys.path.insert(0, _here)
