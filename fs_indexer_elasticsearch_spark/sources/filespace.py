"""Filespace discovery/selection (reference
lucidlink/filespace_prompt.py:64-140).

The reference shells out to the `lucid{2,3}` CLI: `list --json` to
enumerate filespaces, auto-selects a single result, prompts the user
to pick among several, then reads the mount point from
`--instance <id> status`. Re-expressed with the side effects
injected — ``runner`` replaces subprocess (tests feed canned CLI
output) and ``chooser`` replaces the interactive input() loop — so
the selection logic is testable and usable non-interactively (a
batch driver passes ``chooser=lambda names: 0``).
"""

from __future__ import annotations

import json
from collections.abc import Callable

Runner = Callable[[list[str]], str]
Chooser = Callable[[list[str]], int]


class FilespaceError(RuntimeError):
    pass


def _subprocess_runner(args: list[str]) -> str:
    import subprocess

    return subprocess.run(args, capture_output=True, text=True, check=True).stdout


def _interactive_chooser(names: list[str]) -> int:
    print("\nAvailable filespaces:")
    for i, n in enumerate(names, 1):
        print(f"{i}. {n}")
    while True:
        raw = input(f"\nEnter the number of the filespace to index (1-{len(names)}): ")
        try:
            idx = int(raw) - 1
        except ValueError:
            print("Invalid input. Please enter a number.")
            continue
        if 0 <= idx < len(names):
            return idx
        print(f"Invalid choice. Please enter a number between 1 and {len(names)}")


def get_mount_point(bin_name: str, instance_id: int, runner: Runner | None = None) -> str:
    """Mount point from `<bin> --instance <id> status`
    (filespace_prompt.py:31-58)."""
    out = (runner or _subprocess_runner)([bin_name, "--instance", str(instance_id), "status"])
    for line in out.splitlines():
        if line.startswith("Mount point:"):
            return line.split(":", 1)[1].strip()
    raise FilespaceError(f"no 'Mount point:' line in {bin_name} status output")


def get_filespace_info(
    config: dict | None = None,
    version: int | None = None,
    *,
    runner: Runner | None = None,
    chooser: Chooser | None = None,
) -> tuple[str, str, int, str]:
    """(filespace_raw, filespace_name, port, mount_point) — name is the
    raw filespace with dots dashed (the ES index naming rule,
    filespace_prompt.py:64-140). Single filespace auto-selects;
    several go through ``chooser``."""
    # Config supplies the version only when it actually CARRIES one —
    # a config dict without the key must not silently override an
    # explicit ``version`` argument with the default.
    if config is not None and version is None:
        version = config.get("lucidlink_filespace", {}).get("lucidlink_version")
    version = version or 3
    bin_name = f"lucid{version}"
    run = runner or _subprocess_runner

    filespaces = json.loads(run([bin_name, "list", "--json"]))
    if not filespaces:
        raise FilespaceError("no filespaces found")
    if len(filespaces) == 1:
        chosen = filespaces[0]
    else:
        pick = (chooser or _interactive_chooser)(
            [f"{fs['filespace']} (port: {fs['port']})" for fs in filespaces]
        )
        chosen = filespaces[pick]
    raw = chosen["filespace"]
    mount = get_mount_point(bin_name, chosen["instanceId"], run)
    return raw, raw.replace(".", "-"), chosen["port"], mount
