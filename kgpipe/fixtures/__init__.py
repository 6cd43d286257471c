from kgpipe.fixtures.generator import (  # noqa: F401
    PRED_PHRASES,
    generate,
    materialize,
)
