from .settings import KZGSettings  # noqa: F401
from .setup import (  # noqa: F401
    generate_testing_setup,
    generate_testing_setup_ints,
    secret_from_string,
)
from .persist import (  # noqa: F401
    load_fk20_multi,
    load_fk20_single,
    load_kzg_settings,
    save_fk20_multi,
    save_fk20_single,
    save_kzg_settings,
)
