from .explain import plan_string, assert_pushed_filters, assert_broadcast_join  # noqa: F401
