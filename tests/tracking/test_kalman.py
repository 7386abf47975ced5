

def test_remove_second_bests_from_cost_matrix():
    import numpy as np
    from sleap_tpu.tracking.kalman import remove_second_bests_from_cost_matrix

    # Track 0 (col 0): two close matches -> whole column invalidated.
    # Row 1's best is col 0 (now invalid) -> row invalidated too.
    cm = np.array([
        [1.0, 10.0, 20.0],
        [1.5, 12.0, 25.0],
        [30.0, 2.0, 40.0],
    ])
    out = remove_second_bests_from_cost_matrix(cm, thresh=1.0)
    assert np.all(np.isnan(out[:, 0]))          # ambiguous column
    # Rows 0 and 1 both had their best match in the ruled-out column, so
    # they must not fall back to their second choices.
    assert np.all(np.isnan(out[0]))
    assert np.all(np.isnan(out[1]))
    assert out[2, 1] == 2.0                     # clean match survives
    # Input not modified in place.
    assert cm[0, 0] == 1.0
