"""Shared ``--key=value`` argv parsing for the tools/ CLIs.

The tools use a uniform flag style (``--run_id=strong-r2``); a bare
``dict(a.split("=", 1) ...)`` raises an unhelpful ValueError on any entry
without '=' (e.g. ``--help``) — this helper errors clearly instead and
serves the module docstring as usage (ADVICE r2)."""

from __future__ import annotations

from typing import Dict, Optional, Sequence


def parse_kv_args(argv: Sequence[str], usage: Optional[str] = None
                  ) -> Dict[str, str]:
    if any(a in ("--help", "-h") for a in argv):
        raise SystemExit(usage or "usage: --key=value ...")
    args = {}
    for a in argv:
        if "=" not in a or not a.startswith("--"):
            raise SystemExit(
                f"bad argument {a!r}: tools take --key=value flags only\n"
                + (usage or "")
            )
        key, value = a.split("=", 1)
        args[key] = value
    return args
