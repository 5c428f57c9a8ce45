// Raw-RNS Go value types and their C-struct marshaling — the analog of
// the reference's plug-in/lattigo/acc/{argument.go,
// c_struct_import_export.go}, written against OUR C ABI
// (csrc/lattisense_plugin.h; struct layout mirrors abi/c_types.h).
package lattisense

/*
#include <stdlib.h>
#include "lattisense_plugin.h"
*/
import "C"

import (
	"unsafe"
)

// DataType mirrors the C ABI enum.
type DataType int

const (
	TypePlaintext DataType = iota
	TypeCiphertext
	TypeRelinKey
	TypeGaloisKey
	TypeSwitchKey
	TypeCustom
)

var typeNames = map[DataType]string{
	TypePlaintext: "pt", TypeCiphertext: "ct", TypeRelinKey: "rlk",
	TypeGaloisKey: "glk", TypeSwitchKey: "swk",
}

// Ciphertext is a raw-RNS ciphertext: Data[poly][limb] is one length-n
// residue row. Degree = len(Data)-1.
type Ciphertext struct {
	Level int
	Data  [][][]uint64
}

// Plaintext is a raw-RNS plaintext (one polynomial).
type Plaintext struct {
	Level int
	Data  [][]uint64
}

// KeySwitchKey holds beta gadget rows, each a degree-1 pair over Q·P:
// Keys[b][j][limb] is a length-n row (j in {0,1}).
type KeySwitchKey struct {
	Level int
	Keys  [][2][][]uint64
}

// GaloisKeys maps galois element -> switching key.
type GaloisKeys struct {
	Level    int
	Elements []uint64
	Keys     []KeySwitchKey
}

// Argument pairs a signature id with its values (flat, signature order).
// Values elements are *Ciphertext, *Plaintext, *KeySwitchKey or
// *GaloisKeys depending on Type.
type Argument struct {
	ID     string
	Type   DataType
	Level  int
	Values []interface{}
}

// pinned tracks C allocations for one Run call.
type pinned struct {
	blocks []unsafe.Pointer
}

func (p *pinned) alloc(size int) unsafe.Pointer {
	ptr := C.malloc(C.size_t(size))
	p.blocks = append(p.blocks, ptr)
	return ptr
}

func (p *pinned) free() {
	for _, b := range p.blocks {
		C.free(b)
	}
	p.blocks = nil
}

func (p *pinned) cstring(s string) *C.char {
	cs := C.CString(s)
	p.blocks = append(p.blocks, unsafe.Pointer(cs))
	return cs
}

// copyRow copies a Go residue row into freshly malloc'd C memory.
func (p *pinned) copyRow(row []uint64) *C.uint64_t {
	buf := p.alloc(8 * len(row))
	dst := unsafe.Slice((*uint64)(buf), len(row))
	copy(dst, row)
	return (*C.uint64_t)(buf)
}

func (p *pinned) makePoly(rows [][]uint64) C.CPolynomial {
	comps := p.alloc(int(unsafe.Sizeof(C.CComponent{})) * len(rows))
	cs := unsafe.Slice((*C.CComponent)(comps), len(rows))
	for i, row := range rows {
		cs[i] = C.CComponent{n: C.int(len(row)), data: p.copyRow(row)}
	}
	return C.CPolynomial{n_component: C.int(len(rows)),
		components: (*C.CComponent)(comps)}
}

func (p *pinned) makeCiphertext(ct *Ciphertext) *C.CCiphertext {
	cc := (*C.CCiphertext)(p.alloc(int(unsafe.Sizeof(C.CCiphertext{}))))
	polys := p.alloc(int(unsafe.Sizeof(C.CPolynomial{})) * len(ct.Data))
	ps := unsafe.Slice((*C.CPolynomial)(polys), len(ct.Data))
	for i, poly := range ct.Data {
		ps[i] = p.makePoly(poly)
	}
	cc.level = C.int(ct.Level)
	cc.degree = C.int(len(ct.Data) - 1)
	cc.polys = (*C.CPolynomial)(polys)
	return cc
}

func (p *pinned) makePlaintext(pt *Plaintext) *C.CPlaintext {
	cp := (*C.CPlaintext)(p.alloc(int(unsafe.Sizeof(C.CPlaintext{}))))
	cp.level = C.int(pt.Level)
	cp.poly = p.makePoly(pt.Data)
	return cp
}

func (p *pinned) makeKsk(k *KeySwitchKey) C.CKeySwitchKey {
	pks := p.alloc(int(unsafe.Sizeof(C.CPublicKey{})) * len(k.Keys))
	ks := unsafe.Slice((*C.CPublicKey)(pks), len(k.Keys))
	for b, pair := range k.Keys {
		polys := p.alloc(int(unsafe.Sizeof(C.CPolynomial{})) * 2)
		ps := unsafe.Slice((*C.CPolynomial)(polys), 2)
		ps[0] = p.makePoly(pair[0])
		ps[1] = p.makePoly(pair[1])
		ks[b] = C.CPublicKey{level: C.int(k.Level), degree: 1,
			polys: (*C.CPolynomial)(polys)}
	}
	return C.CKeySwitchKey{n_public_key: C.int(len(k.Keys)),
		public_keys: (*C.CPublicKey)(pks)}
}

func (p *pinned) makeGlk(g *GaloisKeys) *C.CGaloisKey {
	cg := (*C.CGaloisKey)(p.alloc(int(unsafe.Sizeof(C.CGaloisKey{}))))
	elems := p.alloc(8 * len(g.Elements))
	es := unsafe.Slice((*uint64)(elems), len(g.Elements))
	copy(es, g.Elements)
	kks := p.alloc(int(unsafe.Sizeof(C.CKeySwitchKey{})) * len(g.Keys))
	ks := unsafe.Slice((*C.CKeySwitchKey)(kks), len(g.Keys))
	for i := range g.Keys {
		ks[i] = p.makeKsk(&g.Keys[i])
	}
	cg.n_key_switch_key = C.int(len(g.Keys))
	cg.galois_elements = (*C.uint64_t)(elems)
	cg.key_switch_keys = (*C.CKeySwitchKey)(kks)
	return cg
}

func exportArguments(args []Argument) ([]C.CArgument, *pinned) {
	p := &pinned{}
	out := make([]C.CArgument, len(args))
	for i, a := range args {
		ptrs := p.alloc(int(unsafe.Sizeof(unsafe.Pointer(nil))) * len(a.Values))
		pp := unsafe.Slice((*unsafe.Pointer)(ptrs), len(a.Values))
		for j, v := range a.Values {
			switch x := v.(type) {
			case *Ciphertext:
				pp[j] = unsafe.Pointer(p.makeCiphertext(x))
			case *Plaintext:
				pp[j] = unsafe.Pointer(p.makePlaintext(x))
			case *KeySwitchKey:
				k := (*C.CKeySwitchKey)(p.alloc(int(unsafe.Sizeof(C.CKeySwitchKey{}))))
				*k = p.makeKsk(x)
				pp[j] = unsafe.Pointer(k)
			case *GaloisKeys:
				pp[j] = unsafe.Pointer(p.makeGlk(x))
			}
		}
		out[i] = C.CArgument{
			id:    p.cstring(a.ID),
			_type: C.DataType(a.Type),
			data:  ptrs,
			level: C.int(a.Level),
			size:  C.int(len(a.Values)),
		}
	}
	return out, p
}

func exportOutputArguments(args []*Argument) ([]C.CArgument, *pinned) {
	p := &pinned{}
	out := make([]C.CArgument, len(args))
	for i, a := range args {
		n := len(a.Values)
		if n == 0 {
			n = 1
		}
		ptrs := p.alloc(int(unsafe.Sizeof(unsafe.Pointer(nil))) * n)
		out[i] = C.CArgument{
			id:    p.cstring(a.ID),
			_type: C.DataType(a.Type),
			data:  ptrs,
			level: C.int(a.Level),
			size:  C.int(n),
		}
	}
	return out, p
}

// importOutput converts the runner-owned output CCiphertexts back into
// Go-native values (copied — valid past Release).
func importOutput(arg *C.CArgument) []interface{} {
	n := int(arg.size)
	pp := unsafe.Slice((*unsafe.Pointer)(arg.data), n)
	vals := make([]interface{}, n)
	for i := 0; i < n; i++ {
		cc := (*C.CCiphertext)(pp[i])
		nPoly := int(cc.degree) + 1
		ps := unsafe.Slice(cc.polys, nPoly)
		data := make([][][]uint64, nPoly)
		for j := 0; j < nPoly; j++ {
			nComp := int(ps[j].n_component)
			cs := unsafe.Slice(ps[j].components, nComp)
			data[j] = make([][]uint64, nComp)
			for k := 0; k < nComp; k++ {
				src := unsafe.Slice((*uint64)(unsafe.Pointer(cs[k].data)),
					int(cs[k].n))
				row := make([]uint64, len(src))
				copy(row, src)
				data[j][k] = row
			}
		}
		vals[i] = &Ciphertext{Level: int(cc.level), Data: data}
	}
	return vals
}
