from .settings import KZGSettings  # noqa: F401
from .setup import (  # noqa: F401
    generate_testing_setup,
    generate_testing_setup_ints,
    secret_from_string,
)
