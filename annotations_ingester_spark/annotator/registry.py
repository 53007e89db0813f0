"""Named annotator registry — the engine API SURVEY §2.9 specifies:
``register_annotator(name, urls, mode, params, retries)``.

Registered annotators are *factories* (executor-side construction; clients
aren't picklable) addressable by name from config files and plans:

    register_annotator("bioyodie", urls=[...], mode="gate-nlp")
    pipe = AnnotationPipeline(get_annotator("bioyodie"))

The ``fake://`` scheme resolves to the deterministic test annotator.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from annotations_ingester_spark.annotator.service import Annotator, HttpNlpClient

_REGISTRY: dict[str, Callable[[], Annotator]] = {}


def register_annotator(
    name: str,
    urls: list[str] | None = None,
    mode: str = "medcat",
    params: dict[str, Any] | None = None,
    retries: int = 1,
    auth: tuple[str, str] | None = None,
    factory: Callable[[], Annotator] | None = None,
    max_in_flight: int | None = None,
    rate_limit_per_sec: float | None = None,
) -> None:
    """Register a named annotator. Pass either connection details (an
    HttpNlpClient is built per partition) or an explicit ``factory``."""
    if factory is None:
        if urls and urls[0].startswith("fake://"):
            from annotations_ingester_spark.annotator.fake import DeterministicFakeAnnotator

            fake_mode = "gate" if mode in ("gate", "gate-nlp") else "medcat"
            factory = lambda: DeterministicFakeAnnotator(fake_mode)  # noqa: E731
        else:

            def factory(  # type: ignore[misc]
                _urls=list(urls or []), _mode=mode, _params=dict(params or {}),
                _retries=retries, _auth=auth,
                _mif=max_in_flight, _rate=rate_limit_per_sec,
            ):
                return HttpNlpClient(
                    _urls, mode=_mode, application_params=_params,
                    max_retries=_retries, auth=_auth,
                    max_in_flight=_mif, rate_limit_per_sec=_rate,
                )

    _REGISTRY[name] = factory


def get_annotator(name: str) -> Callable[[], Annotator]:
    if name not in _REGISTRY:
        raise KeyError(f"no annotator registered under {name!r}; have {sorted(_REGISTRY)}")
    return _REGISTRY[name]


def list_annotators() -> list[str]:
    return sorted(_REGISTRY)


# Built-ins: the deterministic fakes used by tests/oracles.
register_annotator("fake-medcat", urls=["fake://nlp"], mode="medcat")
register_annotator("fake-gate", urls=["fake://nlp"], mode="gate-nlp")
