"""Generated man pages: validity and freshness.

The pages in docs/man/ are generated from the live command registry
(mash_tpu/utils/manpages.py); this pins that they exist, contain every
registered command and option identifier, and match a fresh render
(i.e. nobody hand-edited them or changed the CLI without regenerating).
"""

import os

from mash_tpu.commands import command_registry
from mash_tpu.utils import manpages

MAN_DIR = os.path.join(
    os.path.dirname(__file__), "..", "docs", "man"
)


def test_every_command_has_a_fresh_page():
    top = open(os.path.join(MAN_DIR, "mash-tpu.1")).read()
    assert top == manpages.render_top_page()
    for name, cls in command_registry().items():
        path = os.path.join(MAN_DIR, "mash-tpu-%s.1" % name)
        assert os.path.exists(path), "missing man page for " + name
        got = open(path).read()
        assert got == manpages.render_command_page(cls), (
            "stale man page for %s - regenerate with "
            "`python -m mash_tpu.utils.manpages docs/man`" % name
        )


def test_pages_cover_all_options():
    for name, cls in command_registry().items():
        page = open(
            os.path.join(MAN_DIR, "mash-tpu-%s.1" % name)
        ).read()
        cmd = cls()
        for opt in cmd.options.values():
            assert "\\fB\\-%s\\fR" % opt.identifier in page, (
                name, opt.identifier
            )


def test_troff_escaping():
    # no unescaped leading dots that troff would eat as macros
    for fn in os.listdir(MAN_DIR):
        for line in open(os.path.join(MAN_DIR, fn)):
            if line.startswith(".") and not line.split()[0][1:].isupper():
                allowed = {".TP", ".SS", ".SH", ".TH", ".B", ".BR"}
                assert line.split()[0] in allowed or line.startswith(
                    ".\\\""
                ), (fn, line)
