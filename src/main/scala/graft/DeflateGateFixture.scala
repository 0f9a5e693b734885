package graft

/** The q_compression_ratio gate's cross-implementation deflate oracle
  * (round-9 verdict #2): SQL engines expose no deflate, so the oracle
  * cannot recompute compressed lengths — but the gate corpus at oracle
  * scale (sf0.01 documents, 500 docs, doc_id 0..499 contiguous) is
  * deterministic, so the INDEPENDENT implementation that already pins
  * [[graft.functions.DeflateLen]] byte-for-byte (CPython's zlib at
  * level 6) emitted the per-doc compressed lengths ONCE, and they ride
  * into the oracle SQL as a VALUES literal — the same fixed-table trick
  * as the q_bpe_encode merge list. That makes the gate a genuine
  * cross-implementation full oracle (rows+schema+hash) with zero
  * circularity: Spark computes deflate via java.util.zip.Deflater, the
  * oracle replays CPython-zlib constants, and agreement pins both the
  * ratio arithmetic and the p98 keep flag end-to-end. Regeneration (if
  * the test corpus ever changes):
  * `len(zlib.compress(text.encode('utf-8'), 6))` per doc in doc_id
  * order.
  */
private[graft] object DeflateGateFixture {

  /** CPython-zlib level-6 compressed byte length of sf0.01 document
    * `doc_id` at index `doc_id` (ids are contiguous 0..499). */
  val lengths: IndexedSeq[Int] = IndexedSeq(
    99, 181, 133, 99, 139, 162, 64, 186, 201, 180, 124, 152, 164, 164, 208, 128, 75, 194, 191, 58,
    179, 121, 200, 109, 213, 212, 61, 170, 165, 116, 110, 136, 217, 131, 111, 197, 87, 171, 115, 92,
    186, 165, 150, 106, 88, 195, 198, 132, 102, 132, 133, 168, 62, 114, 172, 111, 225, 202, 179, 84,
    213, 150, 178, 219, 91, 76, 170, 166, 109, 157, 220, 166, 132, 213, 44, 153, 177, 160, 134, 61,
    109, 173, 140, 74, 177, 101, 94, 93, 145, 90, 88, 194, 99, 86, 92, 150, 188, 159, 219, 122,
    208, 129, 205, 217, 131, 164, 67, 124, 67, 184, 55, 223, 159, 192, 115, 96, 59, 132, 182, 77,
    122, 113, 81, 99, 154, 113, 205, 195, 201, 191, 100, 154, 169, 215, 95, 225, 159, 130, 176, 148,
    105, 186, 223, 180, 75, 185, 90, 203, 107, 102, 141, 216, 122, 190, 197, 177, 89, 75, 78, 181,
    129, 204, 202, 138, 84, 86, 164, 210, 125, 172, 87, 165, 80, 229, 159, 103, 208, 143, 119, 204,
    118, 83, 171, 82, 200, 147, 184, 211, 139, 121, 196, 88, 89, 110, 107, 160, 167, 218, 135, 104,
    151, 165, 202, 89, 84, 179, 89, 182, 82, 124, 215, 144, 134, 207, 64, 222, 224, 172, 199, 100,
    230, 133, 140, 201, 193, 191, 83, 203, 207, 179, 157, 101, 160, 203, 165, 128, 60, 184, 136, 106,
    183, 212, 184, 110, 174, 199, 107, 189, 199, 199, 136, 221, 138, 116, 76, 95, 60, 85, 186, 134,
    90, 206, 135, 202, 232, 140, 127, 190, 121, 206, 214, 154, 218, 103, 226, 49, 224, 97, 179, 144,
    215, 100, 110, 200, 146, 220, 140, 78, 109, 116, 220, 189, 194, 176, 207, 114, 169, 160, 116, 219,
    123, 218, 209, 202, 128, 56, 189, 157, 80, 133, 95, 215, 170, 66, 124, 201, 188, 181, 200, 209,
    188, 151, 138, 167, 127, 164, 119, 110, 219, 166, 163, 147, 119, 115, 209, 156, 181, 136, 75, 112,
    136, 198, 82, 98, 196, 161, 187, 143, 95, 195, 201, 173, 223, 160, 195, 156, 170, 136, 57, 158,
    195, 172, 71, 167, 142, 65, 149, 127, 60, 148, 124, 171, 101, 186, 112, 161, 173, 134, 171, 183,
    198, 161, 94, 138, 78, 183, 209, 122, 165, 97, 92, 135, 93, 199, 179, 195, 138, 144, 83, 158,
    96, 190, 106, 208, 129, 157, 198, 81, 71, 146, 192, 194, 180, 192, 186, 161, 150, 219, 189, 91,
    197, 198, 173, 177, 186, 92, 202, 186, 148, 226, 188, 158, 175, 114, 193, 112, 137, 198, 112, 116,
    134, 224, 201, 146, 188, 155, 90, 218, 146, 112, 98, 84, 174, 227, 95, 59, 85, 121, 164, 181,
    146, 180, 165, 218, 119, 163, 212, 172, 121, 54, 134, 164, 118, 155, 176, 70, 71, 93, 150, 173,
    164, 67, 104, 139, 129, 97, 114, 161, 121, 155, 147, 176, 68, 201, 117, 178, 196, 87, 204, 104)
}
