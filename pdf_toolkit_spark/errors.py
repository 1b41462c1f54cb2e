"""User-facing error type (analog of the reference's UserError,
/root/reference/src/pdf-toolkit/utils.py:14)."""

from __future__ import annotations


class UserError(Exception):
    """Raised for user-facing problems that deserve a clear message
    instead of a stack trace (bad config values, bad page specs)."""
