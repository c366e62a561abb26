// Placeholder translation unit so the CMake target builds before the packed
// dataset format lands (next milestone).
extern "C" int packed_reader_version() { return 0; }
