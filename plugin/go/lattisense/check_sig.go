// Go-side pre-flight signature checking — the analog of the reference's
// plug-in/lattigo/acc/check_sig.go, validating user arguments against
// task_signature.json BEFORE crossing the C ABI. Error strings are the
// reference SDK's verbatim formats (cxx_sdk_v2/check_sig.h:53-268; the
// same strings the runner itself raises — tests assert them through both
// surfaces).
package lattisense

import (
	"fmt"
)

// sigRow is one entry of task_signature.json's "signature" list.
type sigRow struct {
	ID    string
	Type  string
	Size  []int
	Level int
	HasLv bool
}

// sigRows parses one signature section ("online" / "offline"),
// keeping only input-phase rows ("in" / "offline").
func (t *FheTaskTpu) sigRows(section string) []sigRow {
	raw, _ := t.Signature[section].([]interface{})
	rows := make([]sigRow, 0, len(raw))
	for _, r := range raw {
		m, ok := r.(map[string]interface{})
		if !ok {
			continue
		}
		if ph, _ := m["phase"].(string); ph != "in" && ph != "offline" {
			continue
		}
		row := sigRow{}
		row.ID, _ = m["id"].(string)
		row.Type, _ = m["type"].(string)
		if szs, ok := m["size"].([]interface{}); ok {
			for _, s := range szs {
				row.Size = append(row.Size, int(s.(float64)))
			}
		}
		if lv, ok := m["level"].(float64); ok {
			row.Level = int(lv)
			row.HasLv = true
		}
		rows = append(rows, row)
	}
	return rows
}

func valueTypeName(v interface{}, declared string) string {
	switch x := v.(type) {
	case *Ciphertext:
		if len(x.Data) == 3 {
			return "ct3"
		}
		return "ct"
	case *Plaintext:
		// pt / pt_ringt / pt_mul genuinely share the raw layout, so the
		// declared name is trusted WITHIN the pt family only; a plaintext
		// supplied where the signature declares ct must still produce the
		// reference's verbatim type-mismatch error (check_sig.h:53).
		switch declared {
		case "pt", "pt_ringt", "pt_mul":
			return declared
		}
		return "pt"
	case *KeySwitchKey:
		return "rlk"
	case *GaloisKeys:
		return "glk"
	}
	return declared
}

// checkWithSig validates one argument against its signature row
// (reference check_with_sig, check_sig.h:53).
func checkWithSig(a Argument, row sigRow) error {
	if a.ID != row.ID {
		return fmt.Errorf("For argument %s, expected id is %s, but input id is %s.",
			a.ID, row.ID, a.ID)
	}
	declared := row.Type
	got := declared
	if len(a.Values) > 0 {
		got = valueTypeName(a.Values[0], declared)
	}
	if got != declared {
		return fmt.Errorf("For argument %s, expected type is %s, but input type is %s.",
			a.ID, declared, got)
	}
	expected := 1
	for _, s := range row.Size {
		expected *= s
	}
	if len(a.Values) != expected {
		return fmt.Errorf("For argument %s, expected size is %d, but input size is %d.",
			a.ID, expected, len(a.Values))
	}
	if row.HasLv {
		for _, v := range a.Values {
			lv := a.Level
			switch x := v.(type) {
			case *Ciphertext:
				lv = x.Level
			case *Plaintext:
				lv = x.Level
			}
			if lv != row.Level {
				return fmt.Errorf("For argument %s, expected level is %d, but input level is %d.",
					a.ID, row.Level, lv)
			}
		}
	}
	return nil
}

// CheckSignatures validates data arguments in order against the task's
// online signature (the offline signature replaces it when non-empty —
// reference check_sig.h:244-246 semantics, same rule as
// lattisense_tpu/plugin/foreign_task.py); key arguments (rlk/glk) are
// validated level-wise against the key signature by the runner itself.
func (t *FheTaskTpu) CheckSignatures(inputs []Argument) error {
	rows := t.sigRows("offline")
	if len(rows) == 0 {
		rows = t.sigRows("online")
	}
	data := make([]Argument, 0, len(inputs))
	for _, a := range inputs {
		if a.Type == TypeCiphertext || a.Type == TypePlaintext {
			data = append(data, a)
		}
	}
	if len(data) > len(rows) {
		return fmt.Errorf("Too many input arguments: %d, expected %d.",
			len(data), len(rows))
	}
	for i, a := range data {
		if err := checkWithSig(a, rows[i]); err != nil {
			return err
		}
	}
	return nil
}
