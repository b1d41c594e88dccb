"""Subcommand implementations (reference ``Command*`` classes)."""

from typing import Callable, Dict, List


def command_registry() -> Dict[str, Callable]:
    """name -> Command factory, in the reference's registration order
    (``src/mash/mash.cpp:23-37``; within/find are compile-gated there and
    always available here)."""
    from mash_tpu.commands.sketch import CommandSketch
    from mash_tpu.commands.dist import CommandDistance
    from mash_tpu.commands.screen import CommandScreen
    from mash_tpu.commands.taxscreen import CommandTaxScreen
    from mash_tpu.commands.triangle import CommandTriangle
    from mash_tpu.commands.contain import CommandContain
    from mash_tpu.commands.find import CommandFind
    from mash_tpu.commands.info import CommandInfo
    from mash_tpu.commands.paste import CommandPaste
    from mash_tpu.commands.bounds import CommandBounds

    ordered = [
        CommandSketch,
        CommandDistance,
        CommandScreen,
        CommandTaxScreen,
        CommandTriangle,
        CommandContain,
        CommandFind,
        CommandInfo,
        CommandPaste,
        CommandBounds,
    ]
    return {c.name: c for c in ordered}
