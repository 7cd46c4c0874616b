from .floquet import (
    TightBinding, FloquetBloch, floquet_matrix, make_peierls_blocks_fn,
    gomez_leon_model,
)
