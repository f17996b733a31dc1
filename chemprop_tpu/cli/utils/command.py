"""``Subcommand`` ABC (cf. reference ``cli/utils/command.py``)."""

from __future__ import annotations

from abc import ABC, abstractmethod
from argparse import ArgumentParser, Namespace

__all__ = ["Subcommand"]


class Subcommand(ABC):
    """A named CLI subcommand: declares its flags and its entry function.

    Subclasses set ``COMMAND`` (the subparser name) and optionally ``HELP``,
    then implement ``add_args`` and ``func``.
    """

    COMMAND: str
    HELP: str | None = None

    @classmethod
    def add(cls, subparsers, parents=()) -> ArgumentParser:
        parser = subparsers.add_parser(cls.COMMAND, help=cls.HELP, parents=list(parents))
        cls.add_args(parser).set_defaults(func=cls.func)
        return parser

    @classmethod
    @abstractmethod
    def add_args(cls, parser: ArgumentParser) -> ArgumentParser: ...

    @classmethod
    @abstractmethod
    def func(cls, args: Namespace): ...
