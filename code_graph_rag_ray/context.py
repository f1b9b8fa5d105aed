"""Shared Ray Data execution-context defaults.

Centralizes the knobs we tune for the 100 TB design point so every entry
point (tests, bench, driver) runs with the same execution profile.
"""

from __future__ import annotations


def configure_data_context(
    *,
    target_max_block_size: int = 64 * 1024 * 1024,
    preserve_order: bool = False,
    quiet: bool = True,
) -> None:
    """Apply engine-wide DataContext defaults.

    ``target_max_block_size`` defaults to 64 MiB (half of Ray's 128 MiB
    default): the pages table carries a wide ``html:binary`` column, and the
    extract stage inflates batches transiently, so smaller blocks keep
    per-task heap bounded when batch × concurrency is in flight. Stages that
    drop the html column early keep downstream blocks dense.

    Idempotent — safe to call from every pipeline entry point.
    """
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.target_max_block_size = target_max_block_size
    ctx.execution_options.preserve_order = preserve_order
    if quiet:
        ctx.enable_progress_bars = False
        try:
            ctx.execution_options.verbose_progress = False
        except AttributeError:  # pragma: no cover - older/newer ray
            pass
