from .generator import generate_user_events, generator_oracle_sql, unique_count

__all__ = ["generate_user_events", "generator_oracle_sql", "unique_count"]
