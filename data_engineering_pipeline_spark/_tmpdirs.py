"""Per-process temp-store lifecycle for queries that materialize side
state (ANN index tables, snapshot tables, frozen decon filters,
signature stores).

Many registry queries build a small on-disk store per invocation —
and the bench/driver executes each query WARMUPS+TIMED_RUNS times per
round, so a bare tempfile.mkdtemp leaks hundreds of dirs into /tmp
per session (r11 ADVICE item 2 flagged the signature-store query; the
ANN/snapshot/decon queries had the same pattern). Deleting at function
exit is unsound: the returned DataFrame is LAZY and still reads the
store until its first action. So each prefix keeps exactly ONE live
dir: the next invocation sweeps the previous invocation's dir (its
frame has long been collected by then), and whatever remains is
removed at interpreter exit.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile

_LIVE: dict[str, str] = {}


def fresh_tmpdir(prefix: str) -> str:
    """A fresh temp dir for `prefix`, sweeping the previous one."""
    prev = _LIVE.pop(prefix, None)
    if prev is not None:
        shutil.rmtree(prev, ignore_errors=True)
    d = tempfile.mkdtemp(prefix=prefix)
    _LIVE[prefix] = d
    return d


@atexit.register
def _sweep_at_exit() -> None:
    while _LIVE:
        shutil.rmtree(_LIVE.popitem()[1], ignore_errors=True)
