//go:build lattigo

// Lattigo bridge — convert tuneinsight/lattigo v4 rlwe types to the raw
// RNS carriers this package marshals across the C ABI. Build-tag-gated
// ("lattigo") because the dependency is not vendored; enable with
//
//	go get github.com/tuneinsight/lattigo/v4 && go build -tags lattigo ./...
//
// Functional shape follows the reference adapter's conversion layer
// (plug-in/lattigo/acc/c_struct_import_export.go): ciphertext polynomial
// coefficient matrices are already RNS limb-major [][]uint64 in Lattigo,
// so the conversion is a reslice + level trim, no arithmetic. Keys cross
// as plain NTT residues (mf_nbits=0 exchange) — pass mfNbits=0 to Run and
// the runner re-enters Montgomery form at import.
package lattisense

import (
	"github.com/tuneinsight/lattigo/v4/rlwe"
)

// FromLattigoCiphertext reslices an rlwe.Ciphertext into the raw carrier
// (no copy of the residue rows; keep the source alive across Run).
func FromLattigoCiphertext(ct *rlwe.Ciphertext) *Ciphertext {
	level := ct.Level()
	data := make([][][]uint64, len(ct.Value))
	for j, poly := range ct.Value {
		data[j] = poly.Coeffs[:level+1]
	}
	return &Ciphertext{Level: level, Data: data}
}

// ToLattigoCiphertext writes a raw output ciphertext back into a
// caller-allocated rlwe.Ciphertext of matching degree/level.
func ToLattigoCiphertext(src *Ciphertext, dst *rlwe.Ciphertext) {
	for j := range dst.Value {
		for l := 0; l <= src.Level; l++ {
			copy(dst.Value[j].Coeffs[l], src.Data[j][l])
		}
	}
}

// FromLattigoRelinKey converts an rlwe.RelinearizationKey's first-degree
// gadget into the raw KeySwitchKey carrier.
func FromLattigoRelinKey(rk *rlwe.RelinearizationKey, level int) *KeySwitchKey {
	swk := rk.Keys[0]
	out := &KeySwitchKey{Level: level}
	for i := range swk.Value {
		for _, pair := range swk.Value[i] {
			var entry [2][][]uint64
			// The ABI carries the full QP gadget rows: Q limbs then P
			// limbs, matching the reference exporter's order (plug-in/
			// lattigo/acc/c_struct_import_export.go:54-57). Dropping P
			// would key-switch incorrectly for hybrid-gadget keys.
			for j := 0; j < 2; j++ {
				rows := append([][]uint64{}, pair.Value[j].Q.Coeffs...)
				if p := pair.Value[j].P; p != nil {
					rows = append(rows, p.Coeffs...)
				}
				entry[j] = rows
			}
			out.Keys = append(out.Keys, entry)
		}
	}
	return out
}
