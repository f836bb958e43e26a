"""Pure-function JAX ops. All ops take/return jnp arrays with static shapes."""
