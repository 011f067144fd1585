"""Shell completion script generation.

The reference offers a ``completion`` subcommand via ``clap_autocomplete``
(src/bin/main.rs:370-397). Here the scripts are generated from the argparse
parser definition, printed to stdout for the user to install
(``--print``-style; auto-install needs root and was the reference's
documented pain point, README.md:57-62).
"""

from __future__ import annotations

import argparse


def _collect_options(parser: argparse.ArgumentParser):
    opts = []
    subcommands = []
    for action in parser._actions:  # noqa: SLF001 - argparse has no public API
        if isinstance(action, argparse._SubParsersAction):
            subcommands.extend(action.choices)
        else:
            opts.extend(o for o in action.option_strings if o.startswith("--"))
            opts.extend(o for o in action.option_strings if not o.startswith("--"))
    return opts, subcommands


def completion_script(shell: str, parser: argparse.ArgumentParser) -> str:
    prog = parser.prog
    func = prog.replace("-", "_")
    opts, subs = _collect_options(parser)
    words = " ".join(opts + subs)
    if shell == "bash":
        return (
            f"_{func}() {{\n"
            f"  local cur=${{COMP_WORDS[COMP_CWORD]}}\n"
            f'  COMPREPLY=( $(compgen -W "{words}" -- "$cur") )\n'
            f"}}\n"
            f"complete -F _{func} {prog}\n"
        )
    if shell == "zsh":
        return (
            f"#compdef {prog}\n"
            f"_arguments -s \\\n"
            + "\n".join(f"  '{o}' \\" for o in opts)
            + "\n  '*::subcommand:(" + " ".join(subs) + ")'\n"
        )
    if shell == "fish":
        lines = [f"complete -c {prog} -l {o.lstrip('-')}" for o in opts if o.startswith("--")]
        lines += [f"complete -c {prog} -a {s}" for s in subs]
        return "\n".join(lines) + "\n"
    raise ValueError(f"unsupported shell {shell!r}")
