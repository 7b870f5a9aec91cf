"""Full DAS pipeline integration test (reference: TestFullDAS,
integration_test.go:68-159) at a reduced scale."""

import sys


def test_full_das_pipeline():
    sys.path.insert(0, ".")
    from examples.full_das_pipeline import run

    assert run(scale=4, coset_width=4, n_checks=1, verbose=False)
