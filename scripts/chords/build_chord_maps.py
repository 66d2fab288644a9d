"""Build the combined chord dictionary + chord-to-index map for JASCO.

Parity: `reference scripts/chords/build_chord_maps.py` — consumes a
directory of ``<id>.chords`` pickles (from extract_chords.py) and writes
``chords_per_track.pkl`` (id -> [(chord, time)]) and
``chord_to_index_mapping.pkl`` (chord -> int, with 'UNK' last), the files
`data/jasco_dataset.py` reads.
"""
import argparse
import os
import pickle


def get_chord_dict(chord_folder: str):
    chord_dict = {}
    distinct_chords = set()
    chord_to_index = {}
    index_counter = 0
    for filename in sorted(os.listdir(chord_folder)):
        if not filename.endswith(".chords"):
            continue
        idx = filename.split(".")[0]
        with open(os.path.join(chord_folder, filename), "rb") as f:
            chord_data = pickle.load(f)
        for chord, _ in chord_data:
            distinct_chords.add(chord)
            if chord not in chord_to_index:
                chord_to_index[chord] = index_counter
                index_counter += 1
        chord_dict[idx] = chord_data
    chord_to_index["UNK"] = index_counter
    return chord_dict, distinct_chords, chord_to_index


def get_predefined_chord_to_index_map(path_to_map: str):
    def inner(chord_folder: str):
        with open(path_to_map, "rb") as f:
            chords_to_index = pickle.load(f)
        distinct_chords = set(chords_to_index.keys())
        chord_dict = {}
        for filename in sorted(os.listdir(chord_folder)):
            if not filename.endswith(".chords"):
                continue
            idx = filename.split(".")[0]
            with open(os.path.join(chord_folder, filename), "rb") as f:
                chord_dict[idx] = pickle.load(f)
        return chord_dict, distinct_chords, chords_to_index
    return inner


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--chords_folder", type=str, required=True)
    parser.add_argument("--output_directory", type=str, default="")
    parser.add_argument("--path_to_pre_defined_map", type=str, default="")
    args = parser.parse_args()
    output_dir = args.output_directory or args.chords_folder
    func = get_chord_dict
    if args.path_to_pre_defined_map:
        func = get_predefined_chord_to_index_map(args.path_to_pre_defined_map)
    chord_dict, distinct_chords, chord_to_index = func(args.chords_folder)
    os.makedirs(output_dir, exist_ok=True)
    with open(os.path.join(output_dir, "chords_per_track.pkl"), "wb") as f:
        pickle.dump(chord_dict, f)
    with open(os.path.join(output_dir,
                           "chord_to_index_mapping.pkl"), "wb") as f:
        pickle.dump(chord_to_index, f)
    print(f"{len(chord_dict)} tracks, {len(distinct_chords)} distinct chords, "
          f"map size {len(chord_to_index)}")


if __name__ == "__main__":
    main()
