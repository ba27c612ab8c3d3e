"""Model-side state: the sharded splat parameter store."""
