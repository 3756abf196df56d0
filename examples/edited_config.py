"""Custom configuration (reference ``examples/edited_config.py``)."""

import matchering_tpu as mg

mg.process(
    target="my_song.wav",
    reference="some_popular_song.wav",
    results=[
        mg.pcm16("my_song_master_16bit.wav"),
        mg.pcm24("my_song_master_24bit.wav"),
    ],
    # Create a custom Config instance to edit the configuration
    config=mg.Config(
        # Increase the maximum length to 30 minutes from the default of 15
        max_length=30 * 60,
        # Master at 96 kHz instead of the default 44.1 kHz internal rate
        internal_sample_rate=96000,
        # Change the threshold value (float, not dB) from -0.01 dB
        threshold=0.7079,  # -3 dB
        # Change the temp folder used for codec conversions
        temp_folder="/tmp",
        # Lower the preview length to 15 seconds from the default 30
        preview_size=15,
        # Allow identical target/reference files
        allow_equality=True,
        # TPU-native extra: on-device compute precision
        dtype="float32",
    ),
)
