from gastx.infer.lifting import (
    DEMO_ROT,
    lift_sequences,
    lift_to_world,
)

__all__ = ["DEMO_ROT", "lift_sequences", "lift_to_world"]
