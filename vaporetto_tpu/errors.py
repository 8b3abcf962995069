"""Error types for vaporetto_tpu.

Mirrors the error surface of the reference implementation
(/root/reference/vaporetto/src/errors.rs:14-111): the exact Display strings
("InvalidArgumentError: {arg}: {msg}" / "InvalidModelError: {msg}") are part of
the tested behaviour contract, so we reproduce them verbatim.
"""

from __future__ import annotations


class VaporettoError(Exception):
    """Base error for all vaporetto_tpu failures."""


class InvalidModelError(VaporettoError):
    """The model data is malformed or has an incompatible version."""

    def __init__(self, msg: str):
        self.msg = msg
        super().__init__(f"InvalidModelError: {msg}")


class InvalidArgumentError(VaporettoError):
    """An argument violates a documented invariant."""

    def __init__(self, arg: str, msg: str):
        self.arg = arg
        self.msg = msg
        super().__init__(f"InvalidArgumentError: {arg}: {msg}")


def invalid_model(msg: str) -> InvalidModelError:
    return InvalidModelError(msg)


def invalid_argument(arg: str, msg: str) -> InvalidArgumentError:
    return InvalidArgumentError(arg, msg)
