"""Job plans: end-to-end cube builds wired as single Spark DAGs."""
