"""Named scalar/batch kernel registry (SURVEY.md A32).

One place where pipelines, queries() and user code share kernel
implementations by name — the Arrow-batch analogue of the reference's
scattered helper methods. Each entry is a callable `pa.Table ->
pa.Table` (batch kernels) or a scalar python function (scalar
kernels); `get(name)` is the lookup used by custom pipelines.
"""

from __future__ import annotations

from engine import css, kernels

SCALAR_FNS = {
    "canonicalize_url": kernels.canonicalize_url,
    "host_of": kernels.host_of,
    "sha1_key": kernels.sha1_key,
    "host_hash64": kernels.host_hash64,
    "discovery_seq": kernels.discovery_seq,
    "extract_text": kernels.extract_text,
    "extract_links": kernels.extract_links,
    "extract_page": kernels.extract_page,
    # CSS-selector extraction (Fizzler analog, engine/css.py)
    "css_select": css.select,
    "css_select_attr": css.select_attr,
    "css_select_text": css.select_text,
}

BATCH_KERNELS = {
    "canonicalize": kernels.canonicalize_batch,
    "key": kernels.key_batch,
    "extract_text": kernels.extract_text_batch,
    "extract_links": kernels.extract_links_batch,
    "extract_page": kernels.extract_page_batch,
}

# factory (selector compiled once, at pipeline construction): use
# register_batch_kernel(name, make_css_kernel(sel, attr=...)) for
# site-specific extractors addressable by name
make_css_kernel = css.make_css_batch_kernel


def get_scalar(name: str):
    return SCALAR_FNS[name]


def get_batch_kernel(name: str):
    return BATCH_KERNELS[name]


def register_batch_kernel(name: str, fn) -> None:
    """User-extension hook: site-specific extractors / custom scalar
    ops (A31/A32) register here and become addressable from pipeline
    configs by name."""
    BATCH_KERNELS[name] = fn
