"""impl= dispatch helper shared by all ops."""

from __future__ import annotations

import jax

__all__ = ["resolve_impl"]


def _default_platform() -> str:
    """Platform computations actually land on, honouring a pinned
    ``jax_default_device`` (the axon/TPU dev box pins cpu in tests)."""
    dev = jax.config.jax_default_device
    if dev is not None:
        return dev if isinstance(dev, str) else dev.platform
    return jax.default_backend()


def resolve_impl(impl: str) -> str:
    """Resolve ``"auto"`` to ``"pallas"`` on TPU (incl. the tunnelled
    ``axon`` platform), ``"jnp"`` elsewhere."""
    if impl == "auto":
        return "pallas" if _default_platform() in ("tpu", "axon") else "jnp"
    if impl not in ("jnp", "pallas", "pallas_interpret"):
        raise ValueError(f"unknown impl {impl!r}")
    return impl
