"""SimpleGQL-style GraphQL layer compiled to DataFrame plans
(SURVEY §2.O). See schema.py / compiler.py / executor.py."""

from .compiler import run_aggregate, run_query
from .executor import GraphQLEngine
from .schema import GqlRelation, GqlSchema, GqlType, resolve_hooks, \
    schema_from_sdl, tpch_schema
from .server import (AuthConfig, AuthError, decode_jwt, encode_jwt,
                     make_server, serve_in_thread)
from .subscriptions import (Subscription, SubscriptionManager,
                            counts_by_type)

__all__ = ["GqlType", "GqlRelation", "GqlSchema", "schema_from_sdl",
           "tpch_schema", "resolve_hooks", "run_query", "run_aggregate", "GraphQLEngine",
           "AuthConfig", "AuthError", "encode_jwt", "decode_jwt",
           "make_server", "serve_in_thread", "Subscription",
           "SubscriptionManager", "counts_by_type"]
