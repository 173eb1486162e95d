"""Invalid-value handlers + the FilterRunner facade.

Reference parity tier (filters/handlers.py:24-296, filters/base.py:566-600):
the engine's DataFrame path keeps errors as data (the ``_errors``
channel — the distributed analog of MemoryHandler), but the reference
also exposes per-value handler *modes*: raise (ExceptionHandler), log
(LogHandler) and accumulate (MemoryHandler). These are driver-side /
per-record facades over the same kernels — useful for porting code that
calls the reference API directly, not for the 100-TB hot path.
"""

from __future__ import annotations

import sys
from collections import OrderedDict
from logging import ERROR, Logger
from typing import Any

from filters_spark.functions.spec import ChainKernel, Kernel, compile_chain


class FilterError(ValueError):
    """Raised by ExceptionHandler on the first invalid value
    (reference base.py:566-585); carries the error context."""

    def __init__(self, *args: Any) -> None:
        super().__init__(*args)
        self.context: dict = {}


class BaseInvalidValueHandler:
    """One ``handle_invalid_value(message, exc_info, context)`` call per
    recorded error (reference base.py:320-412)."""

    def handle_invalid_value(self, message: str, exc_info: bool, context: dict) -> Any:
        raise NotImplementedError

    def handle_exception(self, message: str, exc: Exception) -> Any:
        return self.handle_invalid_value(message, True, {"exc": repr(exc)})


class ExceptionHandler(BaseInvalidValueHandler):
    """Raise-mode (reference base.py:590-597)."""

    def handle_invalid_value(self, message: str, exc_info: bool, context: dict) -> None:
        error = FilterError(message)
        error.context = context
        raise error


class LogHandler(BaseInvalidValueHandler):
    """Log-mode (reference handlers.py:24-45)."""

    def __init__(self, logger: Logger, level: int = ERROR):
        self.logger = logger
        self.level = level

    def handle_invalid_value(self, message: str, exc_info: bool, context: dict) -> None:
        self.logger.log(self.level, message, exc_info=exc_info, extra={"context": context})


class FilterMessage:
    """Consistent API for messages sent to MemoryHandler
    (reference handlers.py:48-93)."""

    def __init__(self, message: str, context: dict, exc_info: str | None = None):
        self.message = message
        self.context = context
        self.code = context.get("code") or message
        self.exc_info = exc_info

    def __repr__(self) -> str:
        return f"{type(self).__name__}({self.message!r}, {self.context!r})"

    def __str__(self) -> str:
        return self.message

    def as_dict(self, with_debug_info: bool = False) -> dict:
        res = {"code": self.code, "message": self.message}
        if with_debug_info:
            res["context"] = self.context
            res["exc_info"] = self.exc_info
        return res


class MemoryHandler(BaseInvalidValueHandler):
    """Accumulate-mode (reference handlers.py:96-137): messages keyed by
    dotted key — the single-value analog of the engine's ``_errors``
    column."""

    def __init__(self, capture_exc_info: bool = False):
        self.messages: "OrderedDict[str, list[FilterMessage]]" = OrderedDict()
        self.has_exceptions = False
        self.capture_exc_info = capture_exc_info
        self.exc_info: list = []

    def handle_invalid_value(self, message: str, exc_info: bool, context: dict) -> None:
        key = context.get("key", "")
        self.messages.setdefault(key, []).append(
            FilterMessage(message, context, exc_info="(captured)" if exc_info else None)
        )

    def handle_exception(self, message: str, exc: Exception) -> Any:
        self.has_exceptions = True
        if self.capture_exc_info:
            self.exc_info.append(sys.exc_info())
        return super().handle_exception(message, exc)


class FilterRunner:
    """Single-payload runner with a pluggable handler mode
    (reference handlers.py:140-296).

    ``handler=None`` accumulates into a private MemoryHandler (the
    reference default); pass ``ExceptionHandler()`` for raise-mode or a
    ``LogHandler`` for log-mode. Errors dispatch to the handler one by
    one, in chain order, with (key, code, message) context."""

    _NO_DATA = object()  # None is a real payload (required rejects it)

    def __init__(self, spec: Any, data: Any = _NO_DATA,
                 handler: BaseInvalidValueHandler | None = None):
        chain = spec if isinstance(spec, Kernel) else compile_chain(spec)
        if not isinstance(chain, ChainKernel):
            chain = ChainKernel([chain])
        self.chain = chain
        self.handler = handler
        self._memory = MemoryHandler()
        self._cleaned: Any = None
        self._ran = False
        self.data: Any = None
        if data is not self._NO_DATA:
            self.apply(data)

    def apply(self, value: Any) -> "FilterRunner":
        self.data = value
        self._memory = MemoryHandler()
        cleaned, errs = self.chain.apply_scalar(value)
        self._cleaned = cleaned
        for (key, code, message) in errs or []:
            ctx = {"key": key, "code": code, "value": value}
            self._memory.handle_invalid_value(message, False, ctx)
            if self.handler is not None:
                self.handler.handle_invalid_value(message, False, ctx)
        self._ran = True
        return self

    # -- reference FilterRunner API ---------------------------------------

    @property
    def is_valid(self) -> bool:
        return not self._memory.messages

    @property
    def cleaned_data(self) -> Any:
        return self._cleaned

    @property
    def errors(self) -> dict:
        """{dotted_key: [{'code', 'message'}]} (handlers.py:232-247)."""
        return self.get_errors(with_context=False)

    def get_errors(self, with_context: bool = False) -> dict:
        return {
            key: [m.as_dict(with_debug_info=with_context) for m in msgs]
            for key, msgs in self._memory.messages.items()
        }

    @property
    def error_messages(self) -> dict:
        return {key: [m.message for m in msgs] for key, msgs in self._memory.messages.items()}
